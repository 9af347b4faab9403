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
