"""Gazetteer dictionaries and ETL.

The reference loads JSON gazetteers ``{neClass: [names...]}`` into a
token trie (annotations.py:678-699). Since this engine ships with no
external data, it embeds small deterministic gazetteers; at production
scale the same loader reads an Iceberg/JSON table and broadcasts the
driver-built trie to executors (SURVEY.md §2.1, §4).

Also includes the gazetteer ETL pipeline (the reference's
``compile_wikidata``-style jobs, annotations.py:1418-1683) re-expressed
as DataFrame transformations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from weak_supervision_for_ner_spark.functions.tokenizer import tokenize
from weak_supervision_for_ner_spark.functions.trie import TokenTrie

# ---------------------------------------------------------------------------
# Embedded gazetteer data (deterministic; no external downloads)
# ---------------------------------------------------------------------------

FIRST_NAMES = {
    "Adam", "Alice", "Amara", "Andrej", "Angela", "Anna", "Antonio",
    "Barack", "Bjorn", "Carlos", "Chen", "Clara", "Daniel", "David",
    "Dmitri", "Elena", "Emma", "Erik", "Fatima", "Felix", "Grace",
    "Hans", "Helga", "Hiroshi", "Ingrid", "Isabel", "Ivan", "James",
    "Jean", "John", "Jorge", "Julia", "Kamala", "Karl", "Kenji",
    "Laila", "Lars", "Leila", "Linus", "Maria", "Marie", "Mark",
    "Mette", "Michael", "Nadia", "Nelson", "Nora", "Olga", "Omar",
    "Pedro", "Pierre", "Priya", "Rahul", "Robert", "Sanna", "Sarah",
    "Sofia", "Sven", "Tarek", "Thomas", "Ursula", "Vaclav", "Wei",
    "William", "Yuki", "Zara",
}

GAZETTEER_DATA: dict[str, dict[str, list[str]]] = {
    "wiki": {
        "PERSON": [
            "Barack Obama", "Angela Merkel", "Nelson Mandela",
            "Marie Curie", "Kamala Harris", "Jean-Pierre Dubois",
            "Erna Solberg", "Washington",
        ],
        "GPE": [
            "Oslo", "Paris", "Berlin", "London", "Tokyo", "Nairobi",
            "New York", "San Francisco", "Washington", "Buenos Aires",
            "Cape Town", "New Delhi", "Singapore",
        ],
        "LOC": ["Mount Everest", "Sahara", "Amazon River", "Lake Geneva", "North Sea"],
        "ORG": [
            "United Nations", "World Bank", "European Commission",
            "Red Cross", "International Monetary Fund", "NATO",
        ],
        "COMPANY": [
            "Nordea Bank", "Telenor", "Statoil", "Deutsche Bank",
            "Acme Corp", "Globex", "Initech", "Vandelay Industries",
        ],
        "PRODUCT": ["iPhone", "Windows", "Android", "Boeing 747", "PlayStation"],
    },
    "geo": {
        "GPE": [
            "Oslo", "Bergen", "Trondheim", "Paris", "Lyon", "Berlin",
            "Munich", "London", "Manchester", "Tokyo", "Osaka",
            "New York", "Chicago", "Mumbai", "Shanghai", "Lagos",
            "Cairo", "Sydney", "Toronto", "Madrid", "Rome", "Vienna",
            "Stockholm", "Helsinki", "Copenhagen", "Amsterdam",
        ],
        "LOC": [
            "Alps", "Andes", "Himalayas", "Danube", "Rhine", "Nile",
            "Baltic Sea", "Pacific Ocean", "Atlantic Ocean",
        ],
    },
    "crunchbase": {
        "COMPANY": [
            "Acme Corp", "Globex", "Initech", "Umbrella Corp",
            "Stark Industries", "Wayne Enterprises", "Hooli",
            "Pied Piper", "Aviato", "Cyberdyne Systems",
            "Tyrell Corp", "Wonka Industries", "Duff Brewing",
            "Soylent Corp", "Oceanic Airlines", "Massive Dynamic",
            "Veridian Dynamics", "NorthWind Analytics", "BlueFjord Labs",
            "GreenVolt Energy",
        ],
        "PERSON": [
            "Elena Vasquez", "Tarek Haddad", "Ingrid Olsen",
            "Hiroshi Tanaka", "Priya Sharma", "Omar Farouk",
        ],
        "ORG": ["Y Combinator", "Sequoia Capital", "Andreessen Horowitz"],
    },
    "product": {
        "PRODUCT": [
            "iPhone", "iPad", "MacBook", "ThinkPad", "Galaxy S22",
            "Model 3", "Roomba", "Kindle", "GoPro", "Walkman",
            "Game Boy", "PlayStation 5", "Xbox Series X", "Quest 3",
            "AeroGlide 9", "HyperLoop One", "SkyWing Drone",
        ],
    },
}

RELATION_LEXICON = {
    ("acquired",): "acquired",
    ("bought",): "acquired",
    ("acquires",): "acquired",
    ("founded",): "founded",
    ("launched",): "launched",
    ("sued",): "sued",
    ("met",): "met",
    ("visited",): "visited",
    ("joined",): "joined",
    ("leads",): "leads",
    ("ceo", "of"): "ceo_of",
    ("chief", "executive", "of"): "ceo_of",
    ("born", "in"): "born_in",
    ("based", "in"): "based_in",
    ("headquartered", "in"): "based_in",
    ("works", "for"): "works_for",
    ("partnered", "with"): "partnered_with",
    ("merged", "with"): "merged_with",
    ("invested", "in"): "invested_in",
    ("signed",): "signed",
}


def _clean_name(name: str) -> str:
    # Removes parentheses and appositions (annotations.py:691 semantics)
    return name.split("(")[0].split(",")[0].rstrip()


def build_trie(data: dict[str, list[str]]) -> TokenTrie:
    """{neClass: [names...]} -> token trie with tuple-of-class values."""
    trie = TokenTrie()
    for ne_class, names in sorted(data.items()):
        for name in names:
            key = tuple(tokenize(_clean_name(name)))
            if key:
                trie.add_class(key, ne_class)
    return trie


def build_gazetteers() -> dict[str, TokenTrie]:
    return {gaz: build_trie(data) for gaz, data in GAZETTEER_DATA.items()}


def canonical_entity_ids() -> dict[str, str]:
    """Entity-linking dictionary: lowercase surface form -> stable KB id."""
    ids: dict[str, str] = {}
    for gaz, data in sorted(GAZETTEER_DATA.items()):
        for ne_class, names in sorted(data.items()):
            for name in sorted(names):
                key = _clean_name(name).lower()
                ids.setdefault(key, f"kb:{ne_class.lower()}/{key.replace(' ', '_')}")
    return ids


# ---------------------------------------------------------------------------
# Gazetteer ETL as DataFrame pipelines (annotations.py:1418-1683 analogues)
# ---------------------------------------------------------------------------

def compile_gazetteer_table(
    raw: DataFrame,
    high_freq_words: DataFrame,
    min_count: int = 1,
    name_col: str = "name",
    class_col: str = "ne_class",
) -> DataFrame:
    """Relational gazetteer compilation: filter -> dedup-merge by name
    -> broadcast anti-join against high-frequency words.

    Spark-first version of ``compile_wikidata`` (annotations.py:1418-1495):
    the scan is declarative, the dedup is a groupBy, and the frequency
    filter is a broadcast anti-join instead of a Python set lookup.
    """
    cleaned = (
        raw
        .withColumn(name_col, F.trim(F.split(F.split(F.col(name_col), r"\(")[0], ",")[0]))
        .filter(F.length(name_col) > 2)
        .filter(~F.col(name_col).rlike(r"^\d+$"))
    )
    deduped = (
        cleaned.groupBy(name_col, class_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    return deduped.join(
        F.broadcast(high_freq_words.select(F.col("word").alias(name_col))),
        on=name_col,
        how="left_anti",
    ).select(name_col, class_col)


def compile_crunchbase_table(orgs: DataFrame, people: DataFrame) -> DataFrame:
    """Crunchbase-style gazetteer ETL (annotations.py:1578-1624) as one
    declarative pipeline:

    - organisations(name, org_type): rows typed ``company``/``investor``
      become COMPANY, everything else ORG (the reference's two-set
      split, :1593-1596) — a when/otherwise, no Python loop;
    - people(first_name, last_name): the reference's name-variant
      explosion (:1608-1615) as an array + explode — "First Last",
      "F. Last", and for spaced first names "First1 Last",
      "First1 F2. Last", "F1. F2. Last";
    - person variants shorter than 3 chars or equal to a legal suffix
      are dropped (:1620).
    """
    from weak_supervision_for_ner_spark.functions.lexicons import LEGAL_SUFFIXES

    org_rows = orgs.select(
        F.col("name"),
        F.when(F.col("org_type").isin("company", "investor"), F.lit("COMPANY"))
        .otherwise(F.lit("ORG"))
        .alias("ne_class"),
    )

    first, last = F.col("first_name"), F.col("last_name")
    fs = F.split(first, " ", 2)
    has_space = F.size(F.split(first, " ")) > 1
    dot = F.lit(".")
    v_full = F.concat_ws(" ", first, last)
    v_initial = F.concat_ws(" ", F.concat(F.substring(first, 1, 1), dot), last)
    v_first1 = F.concat_ws(" ", fs[0], last)
    v_mid_initial = F.concat_ws(
        " ", fs[0], F.concat(F.substring(fs[1], 1, 1), dot), last
    )
    v_both_initials = F.concat_ws(
        " ",
        F.concat(F.substring(fs[0], 1, 1), dot),
        F.concat(F.substring(fs[1], 1, 1), dot),
        last,
    )
    variants = F.when(
        has_space,
        F.array(v_full, v_initial, v_first1, v_mid_initial, v_both_initials),
    ).otherwise(F.array(v_full, v_initial))
    person_rows = (
        people.select(F.explode(F.array_distinct(variants)).alias("name"))
        .filter(F.length("name") > 2)
        .filter(
            ~F.lower(F.regexp_replace("name", r"\.+$", "")).isin(sorted(LEGAL_SUFFIXES))
        )
        .select("name", F.lit("PERSON").alias("ne_class"))
    )
    return org_rows.unionByName(person_rows).distinct()


def compile_product_table(products: DataFrame, name_col: str = "name") -> DataFrame:
    """Product gazetteer ETL (compile_product_data,
    annotations.py:1627-1650): drop parenthesised names, add the
    iPad-case variant for titled entries (``IPad -> iPad``, first char
    I/E + upper + lower, :1639-1641), and pluralise names of at most
    two words — faithfully using the ORIGINAL name's trailing 's' to
    pick the suffix, exactly like the reference (:1644-1646).
    """
    name = F.col(name_col)
    base = products.filter(~name.contains("(")).select(name.alias("name"))
    c1, c2, c3 = (F.substring("name", i, 1) for i in (1, 2, 3))
    ipad = F.when(
        (F.length("name") > 2)
        & c1.isin("I", "E")
        & (c2 == F.upper(c2)) & (c2 != F.lower(c2))
        & (c3 == F.lower(c3)) & (c3 != F.upper(c3)),
        F.concat(F.lower(c1), F.expr("substring(name, 2)")),
    )
    plural_suffix = F.when(F.col("name").endswith("s"), F.lit("es")).otherwise(F.lit("s"))
    forms = F.filter(F.array(name, ipad), lambda x: x.isNotNull())
    expanded = base.select(
        "name", plural_suffix.alias("sfx"), F.explode(forms).alias("form")
    )
    with_plurals = expanded.select(
        F.explode(
            F.when(
                F.size(F.split("form", " ")) <= 2,
                F.array(F.col("form"), F.concat("form", "sfx")),
            ).otherwise(F.array(F.col("form")))
        ).alias("name")
    )
    return with_plurals.select("name", F.lit("PRODUCT").alias("ne_class")).distinct()


def expand_company_names(gazetteer: DataFrame, name_col: str = "name") -> DataFrame:
    """Name-variant expansion to fixpoint (strip legal suffixes and
    generic tokens), reference ``get_alternative_company_names``
    (annotations.py:1498-1542) as a bounded iterative union/distinct."""
    from weak_supervision_for_ner_spark.functions.lexicons import (
        GENERIC_TOKENS,
        LEGAL_SUFFIXES,
    )

    suffix_pattern = (
        r"(?i)\s+(" + "|".join(sorted(LEGAL_SUFFIXES | {t.lower() for t in GENERIC_TOKENS})) + r")\.?$"
    )
    current = gazetteer.select(name_col).distinct()
    for _ in range(3):  # bounded fixpoint — variants shrink monotonically
        stripped = (
            current
            .withColumn("variant", F.regexp_replace(F.col(name_col), suffix_pattern, ""))
            .withColumn("variant", F.regexp_replace(F.col("variant"), r"(?i)^the\s+", ""))
            .filter((F.col("variant") != F.col(name_col)) & (F.length("variant") > 2))
            .select(F.col("variant").alias(name_col))
        )
        new = stripped.exceptAll(current)
        if new.isEmpty():
            break
        current = current.union(new).distinct()
    return current
