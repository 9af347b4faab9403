"""Per-document labelling functions (the weak-supervision LF library).

Pure Python/numpy over token lists — NO Spark imports. The Spark
operator (``operators.annotate``) calls :func:`annotate_document` for
each row inside an Arrow-batched ``mapInPandas`` stage, and the
single-node oracle (``plans.oracle``) calls the very same function, so
distributed output equals the oracle by construction.

Semantics follow the reference annotators:
  - span IR + confidence renormalisation: annotations.py:159-190
  - shallow generators (date/time/money/number): annotations.py:708-814
  - SpanGenerator / company-type / full-name: annotations.py:817-889
  - legal/misc generators: annotations.py:934-991
  - gazetteer matching: annotations.py:629-675, utils.py:17-46
  - standardise / doc-history / doc-majority: annotations.py:1000-1239
  - helper predicates: annotations.py:1250-1365

The reference relies on spaCy lemmas/POS/dep; we use deterministic
casing-based approximations instead (SURVEY.md §7.4) — parity is
defined against this module.
"""

from __future__ import annotations

import re

from weak_supervision_for_ner_spark.functions import lexicons as lx
from weak_supervision_for_ner_spark.functions.tokenizer import tokenize_with_offsets
from weak_supervision_for_ner_spark.functions.trie import TokenTrie

Span = tuple[int, int]
Vals = tuple[tuple[str, float], ...]
Layer = dict[Span, Vals]

_DIGIT_RE = re.compile(r"\d")
_ALL_DIGIT_RE = re.compile(r"\d+$")
_ORDINAL_NUM_RE = re.compile(r"\d+(?:st|nd|rd|th)$")
_TIME_RE = re.compile(r"\d{1,2}:\d{1,2}$")
_DAY_OR_MONTH = lx.DAYS | lx.DAYS_ABBRV
_MONTH = lx.MONTHS | lx.MONTHS_ABBRV
_CURRENCY = lx.CURRENCY_CODES | lx.CURRENCY_SYMBOLS


class Doc:
    """Lightweight per-document container: tokens + derived features +
    annotation layers (the reference's ``doc.user_data['annotations']``)."""

    __slots__ = (
        "text", "tokens", "offsets", "lower", "is_punct", "is_title",
        "is_upper", "is_digit", "is_alpha", "sent_start",
        "likely_proper", "in_compound", "layers", "_alt_forms",
    )

    def __init__(self, text: str, form_freqs: dict | None = None):
        self.text = text
        self.tokens, self.offsets = tokenize_with_offsets(text)
        n = len(self.tokens)
        toks = self.tokens
        self.sent_start = [
            i == 0
            or toks[i - 1] in lx.SENT_END
            or (toks[i - 1].endswith(".") and len(toks[i - 1]) > 1)
            for i in range(n)
        ]
        # quote-edge boundary repair (_correct_sentence_boundaries,
        # spacy_wrapper.py:225-239): an opening curly quote never starts
        # a sentence mid-quote, and a closing quote neither starts one
        # itself nor (without a preceding period) lets the next token
        for i in range(n - 1):
            if toks[i] in {"‘", "“"}:
                self.sent_start[i + 1] = False
            elif toks[i] in {"”", "’"}:
                self.sent_start[i] = False
                if i > 0 and toks[i - 1] != ".":
                    self.sent_start[i + 1] = False
        if n:
            self.sent_start[0] = True
        if form_freqs is not None:
            # Case repair for short/ALL-CAPS docs (spacy_wrapper.py:186-221).
            # Only alphabetic tokens are rewritten, so sentence-boundary
            # flags (driven by punctuation) are unaffected; offsets keep
            # pointing into the original text for span_text extraction.
            from weak_supervision_for_ner_spark.functions.truecase import truecase_tokens

            self.tokens = toks = truecase_tokens(toks, self.sent_start, form_freqs)
        self.lower = [t.lower() for t in toks]
        self.is_punct = [all(c in lx.PUNCT for c in t) for t in toks]
        self.is_title = [t.istitle() for t in toks]
        self.is_upper = [t.isupper() and any(c.isalpha() for c in t) for t in toks]
        self.is_digit = [t.isdigit() for t in toks]
        self.is_alpha = [t.isalpha() for t in toks]
        self.likely_proper = [self._likely_proper(i) for i in range(n)]
        self.in_compound = [
            self.likely_proper[i]
            and (
                (i > 0 and self.likely_proper[i - 1])
                or (i + 1 < n and self.likely_proper[i + 1])
            )
            for i in range(n)
        ]
        self.layers: dict[str, Layer] = {}
        self._alt_forms = None

    @property
    def alt_forms(self) -> list[tuple[str, ...]]:
        """Per-token (title, lower, upper) alternatives for
        case-insensitive trie walks, computed once per doc instead of
        per visited position per uncased gazetteer (4 of them)."""
        if self._alt_forms is None:
            self._alt_forms = [
                (t.title(), t.lower(), t.upper()) for t in self.tokens
            ]
        return self._alt_forms

    def _likely_proper(self, i: int) -> bool:
        """Casing-based proper-name predicate (annotations.py:1250-1271)."""
        tok = self.tokens[i]
        if len(tok) < 2:
            return False
        # iPad-style casing
        if len(tok) > 2 and tok[0].islower() and tok[1].isupper() and tok[2:].islower():
            return True
        # CamelCase brand names (PlayStation, AeroGlide): leading upper
        # with an internal upper and at least one lower
        if (
            len(tok) > 3
            and tok[0].isupper()
            and any(c.isupper() for c in tok[1:])
            and any(c.islower() for c in tok)
            and tok.isalnum()
            and not tok.isupper()
            and not self.is_title[i]
        ):
            return True
        if self.is_upper[i] and tok not in lx.CURRENCY_CODES and tok not in lx.NOT_NAMED_ENTITIES:
            return True
        if self.is_title[i]:
            if i > 0:
                prev = self.tokens[i - 1]
                if (
                    not self.sent_start[i]
                    and prev not in lx.QUOTES
                    and not prev.endswith(".")
                ):
                    return True
            # Sentence-initial titled tokens: accept when clearly
            # out-of-vocabulary (stand-in for the reference's titled-lemma
            # rule, which fires on true proper nouns in any position).
            if self.lower[i] not in lx.COMMON_WORDS and self.is_alpha[i] and len(tok) > 2:
                return True
        return False

    def span_text(self, start: int, end: int) -> str:
        a = self.offsets[start]
        b = self.offsets[end - 1] + len(self.tokens[end - 1])
        return self.text[a:b]

    # ---- span IR operations -------------------------------------------

    def clear(self, source: str) -> None:
        self.layers[source] = {}

    def add(
        self, source: str, start: int, end: int, label: str,
        conf: float = 1.0, to_exclude: tuple[str, ...] = (),
    ) -> None:
        """Add a labelled span with exclusivity filtering and per-span
        confidence-mass renormalisation (annotations.py:159-190)."""
        if end <= start:
            return
        for excl in to_exclude:
            for (s2, e2) in self.layers.get(excl, ()):
                if start < e2 and end > s2:
                    return
        layer = self.layers[source]
        cur = layer.get((start, end))
        if cur is None:
            layer[(start, end)] = ((label, conf),)
            return
        if label in {l for l, _ in cur}:
            return
        total = sum(c for _, c in cur) + conf
        if total > 1.0:
            cur = tuple((l, c / total) for l, c in cur)
            conf = conf / total
        layer[(start, end)] = (*cur, (label, conf))


def is_infrequent(doc: Doc, start: int, end: int) -> bool:
    """Span contains at least one out-of-vocabulary token
    (annotations.py:1274-1277, rank > 15000 analogue)."""
    return any(
        doc.lower[i] not in lx.COMMON_WORDS and not doc.is_punct[i]
        for i in range(start, end)
    )


def merge_contiguous_spans(spans: dict[Span, str], doc: Doc) -> dict[Span, str]:
    """Merge adjacent same-label spans, also across a comma
    (annotations.py:1312-1330)."""
    changed = True
    while changed:
        changed = False
        ordered = sorted(spans)
        for (s1, e1), (s2, e2) in zip(ordered, ordered[1:]):
            joined = e1 == s2 or (e1 == s2 - 1 and doc.tokens[e1] == ",")
            if joined and spans[(s1, e1)] == spans[(s2, e2)]:
                val = spans.pop((s1, e1))
                spans.pop((s2, e2))
                spans[(s1, e2)] = val
                changed = True
                break
    return spans


def get_spans(doc: Doc, sources: list[str]) -> set[Span]:
    """Union of spans across sources, longest-wins overlap resolution
    (annotations.py:1288-1309)."""
    spans: set[Span] = set()
    for source in sources:
        spans.update(doc.layers.get(source, ()))
    changed = True
    while changed:
        changed = False
        ordered = sorted(spans)
        for (s1, e1), (s2, e2) in zip(ordered, ordered[1:]):
            if s2 < e1:
                spans.remove((s2, e2) if (e1 - s1) > (e2 - s2) else (s1, e1))
                changed = True
                break
    return spans


def get_overlaps(
    start: int, end: int, layers: dict[str, Layer], sources=None,
    sorted_items: dict[str, list] | None = None,
) -> list[tuple[int, int, Vals]]:
    """Spans of ``sources`` overlapping [start, end)
    (annotations.py:1333-1348; sorted sweep with early exit instead of
    the reference's hand-rolled binary search — docs are small).

    ``sorted_items`` (source -> sorted ``layer.items()`` list) lets a
    caller that probes MANY spans against the same layers (doc_majority
    does one probe per vote span) hoist the per-layer sort out of the
    loop; iteration order — and therefore float accumulation order
    downstream — is identical either way."""
    out = []
    for source in (sources if sources is not None else layers):
        if sorted_items is not None:
            items = sorted_items.get(source, ())
        else:
            layer = layers.get(source, ())
            items = sorted(layer.items()) if layer else ()
        for iv, vals in items:
            if iv[0] >= end:
                break
            if start < iv[1]:
                out.append((iv[0], iv[1], vals))
    return out


# ---------------------------------------------------------------------------
# Shallow pattern generators (annotations.py:708-814)
# ---------------------------------------------------------------------------

def date_generator(doc: Doc):
    spans: dict[Span, str] = {}
    n = len(doc.tokens)
    i = 0
    while i < n:
        tok = doc.tokens[i]
        if tok in _DAY_OR_MONTH and tok not in _MONTH:
            spans[(i, i + 1)] = "DATE"
        elif doc.is_digit[i] and _ALL_DIGIT_RE.match(tok) and 1920 < int(tok) < 2040:
            spans[(i, i + 1)] = "DATE"
        elif tok in _MONTH:
            if i > 0 and _ALL_DIGIT_RE.match(doc.tokens[i - 1]) and int(doc.tokens[i - 1]) < 32:
                spans[(i - 1, i + 1)] = "DATE"
            elif (
                i > 1
                and _ORDINAL_NUM_RE.match(doc.tokens[i - 2])
                and doc.lower[i - 1] == "of"
            ):
                spans[(i - 2, i + 1)] = "DATE"
            elif (
                i < n - 1
                and _ALL_DIGIT_RE.match(doc.tokens[i + 1])
                and int(doc.tokens[i + 1]) < 32
            ):
                spans[(i, i + 2)] = "DATE"
                i += 1
            else:
                spans[(i, i + 1)] = "DATE"
        i += 1
    yield from ((s, e, lab) for (s, e), lab in merge_contiguous_spans(spans, doc).items())


def time_generator(doc: Doc):
    n = len(doc.tokens)
    i = 0
    while i < n:
        tok = doc.tokens[i]
        if (
            i < n - 1
            and tok[:1].isdigit()
            and doc.lower[i + 1] in {"am", "pm", "a.m.", "p.m.", "am.", "pm."}
        ):
            yield i, i + 2, "TIME"
            i += 1
        elif tok[:1].isdigit() and _TIME_RE.match(tok):
            yield i, i + 1, "TIME"
        i += 1


def money_generator(doc: Doc):
    n = len(doc.tokens)
    i = 0
    while i < n:
        tok = doc.tokens[i]
        if tok[:1].isdigit():
            j = i + 1
            while j < n and (doc.tokens[j][:1].isdigit() or doc.lower[j] in lx.MAGNITUDES):
                j += 1
            found = False
            if i > 0 and doc.tokens[i - 1] in _CURRENCY:
                i -= 1
                found = True
            if j < n and (doc.tokens[j] in _CURRENCY or doc.lower[j] in lx.CURRENCY_WORDS):
                j += 1
                found = True
            if found:
                yield i, j, "MONEY"
            i = j
        else:
            i += 1


def number_generator(doc: Doc):
    n = len(doc.tokens)
    i = 0
    while i < n:
        tok = doc.tokens[i]
        if doc.lower[i] in lx.ORDINAL_WORDS or _ORDINAL_NUM_RE.match(doc.lower[i]):
            yield i, i + 1, "ORDINAL"
        elif _DIGIT_RE.search(tok):
            j = i + 1
            while j < n and doc.lower[j] in lx.MAGNITUDES:
                j += 1
            if j < n and doc.lower[j].rstrip(".") in lx.UNITS:
                yield i, j + 1, "QUANTITY"
                j += 1
            elif j < n and doc.lower[j] in lx.PERCENT_WORDS:
                yield i, j + 1, "PERCENT"
                j += 1
            else:
                yield i, j, "CARDINAL"
            i = j - 1
        i += 1


# ---------------------------------------------------------------------------
# Span generators over token predicates (annotations.py:817-889)
# ---------------------------------------------------------------------------

def span_generator(
    doc: Doc, constraint, label: str = "ENT", exceptions: set[str] = frozenset({"'s", "-"})
):
    """Longest token runs satisfying ``constraint`` with exception
    tokens allowed inside; >=3-char filter (annotations.py:817-851)."""
    n = len(doc.tokens)
    i = 0
    while i < n:
        if constraint(doc, i):
            j = i + 1
            while True:
                if j < n and constraint(doc, j):
                    j += 1
                elif (
                    j < n - 1
                    and doc.tokens[j] in exceptions
                    and constraint(doc, j + 1)
                ):
                    j += 2
                else:
                    break
            if len(doc.span_text(i, j).rstrip(".")) > 2:
                yield i, j, label
            i = j
        else:
            i += 1


def proper_constraint(doc: Doc, i: int) -> bool:
    return doc.likely_proper[i]


def proper2_constraint(doc: Doc, i: int) -> bool:
    # Relaxed variant: any titled/upper alpha token of length >= 2.
    return len(doc.tokens[i]) >= 2 and (doc.is_title[i] or doc.is_upper[i]) and any(
        c.isalpha() for c in doc.tokens[i]
    )


def nnp_constraint(doc: Doc, i: int) -> bool:
    # Proper-noun approximation: likely proper and out-of-vocabulary.
    return doc.likely_proper[i] and doc.lower[i] not in lx.COMMON_WORDS


def compound_constraint(doc: Doc, i: int) -> bool:
    return doc.in_compound[i]


def company_type_generator(doc: Doc):
    """Compound proper spans ending in a legal suffix
    (annotations.py:854-866)."""
    for start, end, _ in span_generator(
        doc, lambda d, i: d.likely_proper[i] and d.in_compound[i]
    ):
        if doc.lower[end - 1].rstrip(".") in lx.LEGAL_SUFFIXES:
            yield start, end, "COMPANY"
        elif end < len(doc.tokens) and doc.lower[end].rstrip(".") in lx.LEGAL_SUFFIXES:
            yield start, end + 1, "COMPANY"


def full_name_generator(doc: Doc, first_names: set[str]):
    """First-name + titled surname spans of 2-4 tokens
    (annotations.py:869-889)."""
    for start, end, _ in span_generator(
        doc,
        lambda d, i: d.likely_proper[i] and d.in_compound[i],
        exceptions=lx.NAME_PREFIXES,
    ):
        if (end - start) < 2 or (end - start) > 5:
            continue
        if (
            doc.tokens[start] in first_names
            and doc.is_alpha[end - 1]
            and doc.is_title[end - 1]
        ):
            yield start, end, "PERSON"


def legal_generator(doc: Doc):
    """LAW spans: proper spans ending in a LEGAL token, plus
    'Article 5'-style references incl. ranges (annotations.py:934-961)."""
    legal_spans: dict[Span, str] = {}
    for (start, end) in get_spans(doc, ["proper2_detector", "nnp_detector"]):
        if not doc.likely_proper[end - 1]:
            continue
        if doc.tokens[end - 1].title().rstrip("s") in lx.LEGAL:
            legal_spans[(start, end)] = "LAW"

    n = len(doc.tokens)
    for i in range(n - 1):
        if doc.tokens[i].rstrip("s") in {"Article", "Paragraph", "Section", "Chapter", "§"}:
            if doc.tokens[i + 1][:1].isdigit() or doc.tokens[i + 1] in lx.ROMAN_NUMERALS:
                start, end = i, i + 2
                if (
                    i < n - 3
                    and doc.tokens[i + 2] in {"-", "to", "and"}
                    and (doc.tokens[i + 3][:1].isdigit() or doc.tokens[i + 3] in lx.ROMAN_NUMERALS)
                ):
                    end = i + 4
                legal_spans[(start, end)] = "LAW"

    yield from ((s, e, lab) for (s, e), lab in merge_contiguous_spans(legal_spans, doc).items())


def misc_generator(doc: Doc):
    """Countries / NORPs / languages / facilities / events over proper
    spans and single tokens (annotations.py:965-991)."""
    spans = set(doc.layers.get("proper_detector", ()))
    spans.update((i, i + 1) for i in range(len(doc.tokens)))
    for (start, end) in sorted(spans):
        span = doc.span_text(start, end)
        if span.isupper():
            span = span.title()
        last = doc.tokens[end - 1]
        if span in lx.COUNTRIES:
            yield start, end, "GPE"
        if end <= start + 3 and (span in lx.NORPS or last in lx.NORPS or last.rstrip("s") in lx.NORPS):
            yield start, end, "NORP"
        if span in lx.LANGUAGES and doc.likely_proper[start]:
            # The reference gates on tag_=="NNP" (annotations.py:984);
            # our proxy: a language-context word precedes, or the next
            # token is not a lowercase noun ("the Norwegian government"
            # is a NORP use, "spoke Norwegian at" is a language use).
            prev_ok = start > 0 and doc.lower[start - 1] in {
                "spoke", "speaks", "speak", "speaking", "in", "language",
                "taught", "teaches", "learn", "learning", "translated",
            }
            next_is_noun = (
                end < len(doc.tokens)
                and doc.is_alpha[end]
                and doc.tokens[end].islower()
            )
            if prev_ok or not next_is_noun:
                yield start, end, "LANGUAGE"
        if last in lx.FACILITIES and end > start + 1:
            yield start, end, "FAC"
        if last in lx.EVENTS and end > start + 1:
            yield start, end, "EVENT"


# ---------------------------------------------------------------------------
# Gazetteer matching (annotations.py:629-675)
# ---------------------------------------------------------------------------

def gazetteer_hits(doc: Doc, trie: TokenTrie, case_sensitive: bool, lookahead: int = 10):
    """Longest-prefix gazetteer matches with proper-noun guard,
    legal-suffix extension, and skip-ahead after a hit."""
    tokens = doc.tokens
    n = len(tokens)
    # Inline first-token gate: the overwhelming majority of positions
    # miss the trie at the ROOT, so test root membership here (one dict
    # containment; the int _VALUE sentinel never collides with str
    # tokens) instead of paying a longest_prefix_at call + loop
    # prologue per position — ~2x on the gazetteer stage, which is the
    # annotation profile's top entry.
    root = trie.root
    alt_forms = doc.alt_forms
    is_punct, likely_proper, in_compound = (
        doc.is_punct, doc.likely_proper, doc.in_compound,
    )
    i = 0
    while i < n:
        if is_punct[i]:
            i += 1
            continue
        # Skip if inside a compound phrase started by the previous token
        if i > 0 and likely_proper[i - 1] and in_compound[i - 1] and in_compound[i]:
            i += 1
            continue
        tok = tokens[i]
        if tok not in root:
            if case_sensitive:
                i += 1
                continue
            for alt in alt_forms[i]:
                if alt != tok and alt in root:
                    break
            else:
                i += 1
                continue
        length, value = trie.longest_prefix_at(
            tokens, i, min(i + lookahead, n),
            None if case_sensitive else alt_forms,
        )
        if length:
            if not any(doc.likely_proper[k] for k in range(i, i + length)):
                i += 1
                continue
            if (
                i + length < n
                and {"ORG", "COMPANY"}.intersection(value)
                and doc.lower[i + length].rstrip(".") in lx.LEGAL_SUFFIXES
            ):
                length += 1
            for ne_class in value:
                yield i, i + length, ne_class, 1.0 / len(value)
            i += length + 1
        else:
            i += 1


# ---------------------------------------------------------------------------
# Cross-layer standardisation (annotations.py:1000-1049)
# ---------------------------------------------------------------------------

GPE_SOURCES = ["geo_cased", "geo_uncased", "wiki_cased", "wiki_uncased", "doc_majority_cased"]
COMPANY_SOURCES = [
    "company_type_detector", "crunchbase_cased", "crunchbase_uncased",
    "doc_majority_cased", "doc_majority_uncased",
]


def _standardise_rewritable(source: str) -> set[str]:
    """The labels standardise's rule body below can rewrite for this
    source — THE single place encoding that knowledge; keep in lockstep
    with the rule conditions in the loop (a new rule family must extend
    this, or the skip fast-path will silently bypass it)."""
    rewritable = {"PER"}
    if source.startswith("doc_majority"):
        rewritable |= {"LOC", "ORG"}
    elif "wiki_" in source:
        rewritable.add("ORG")
    return rewritable


def standardise(doc: Doc) -> None:
    """PER->PERSON rewrite; LOC->GPE / ORG->COMPANY when a same-span
    annotation in the designated layers says so."""
    for source in list(doc.layers):
        # skip layers no rule can touch: only PER (any layer),
        # LOC/ORG (doc_majority*) and ORG (wiki_*) ever rewrite, and a
        # rebuild of an untouched layer is an identity round-trip
        # through doc.add — pure overhead on the ~90% of layers with
        # nothing to rewrite (standardise runs twice per doc). The one
        # exception to "identity": doc.add re-renormalises a span whose
        # conf mass exceeds 1.0 (possible by a float ulp after a
        # build-time renorm), so such layers still take the rebuild —
        # skipping them would drift from the historical output by an
        # ulp, which the (conf, tie-break) vote could amplify.
        rewritable = _standardise_rewritable(source)
        # Single flat pass, no nested generator expressions — this
        # check runs per layer per doc TWICE, and generator allocation
        # here measurably shows in the flagship wall-time. A layer
        # needs the rebuild iff any span has a rewritable label, a
        # multi-label conf mass > 1.0 (doc.add would re-renormalise by
        # an ulp), or ANY negative conf (with one, a PREFIX of vals
        # can exceed 1.0 while the total does not — r4 advice — so the
        # fast-path must not trust the total).
        needs_rebuild = False
        for vals in doc.layers[source].values():
            total = 0.0
            for label, conf in vals:
                if label in rewritable or conf < 0:
                    needs_rebuild = True
                    break
                total += conf
            if needs_rebuild or (len(vals) > 1 and total > 1.0):
                needs_rebuild = True
                break
        if not needs_rebuild:
            continue
        current = dict(doc.layers[source])
        doc.clear(source)
        for span, vals in current.items():
            for label, conf in vals:
                if label == "PER":
                    label = "PERSON"
                if label == "LOC" and source.startswith("doc_majority"):
                    for gpe_source in GPE_SOURCES:
                        for label2, _ in doc.layers.get(gpe_source, {}).get(span, ()):
                            if label2 == "GPE":
                                label = "GPE"
                if label == "ORG" and ("wiki_" in source or source.startswith("doc_majority")):
                    for company_source in COMPANY_SOURCES:
                        for label2, _ in doc.layers.get(company_source, {}).get(span, ()):
                            if label2 == "COMPANY":
                                label = "COMPANY"
                doc.add(source, span[0], span[1], label, conf)


# ---------------------------------------------------------------------------
# Document-level annotators (annotations.py:1057-1239)
# ---------------------------------------------------------------------------

HISTORY_SOURCES_SUFFIX = "cased"
HISTORY_SOURCES_EXACT = {"full_name_detector", "company_type_detector"}


def doc_history(doc: Doc) -> None:
    """Earlier full-name / company-with-suffix mentions propagate to
    later shorter occurrences (annotations.py:1057-1122)."""
    doc.clear("doc_history")
    tokens = tuple(doc.tokens)
    trie = TokenTrie()

    all_spans = sorted(
        (span, vals)
        for source, layer in doc.layers.items()
        if source in HISTORY_SOURCES_EXACT or source.endswith(HISTORY_SOURCES_SUFFIX)
        for span, vals in layer.items()
    )
    for (start, end), vals in all_spans:
        if not vals:
            continue
        label0 = vals[0][0]
        if label0 == "PERSON" and start + 1 < end < start + 5:
            if tokens[end - 1 : end] not in trie:
                trie.insert(tokens[start:end], (start, "PERSON"))
                trie.insert(tokens[end - 1 : end], (start, "PERSON"))
        elif (
            label0 in {"COMPANY", "ORG"}
            and start + 1 < end < start + 8
            and doc.lower[end - 1].rstrip(".") in lx.LEGAL_SUFFIXES
        ):
            if tokens[start : end - 1] not in trie:
                trie.insert(tokens[start : end - 1], (start, "COMPANY"))
                trie.insert(tokens[start:end], (start, "COMPANY"))

    i = 0
    n = len(tokens)
    while i < n:
        length, value = trie.longest_prefix(tokens[i : i + 8])
        if length:
            initial_offset, label = value
            if i > initial_offset:
                doc.add("doc_history", i, i + length, label)
            i += length
        else:
            i += 1


DOC_MAJORITY_SOURCES = [
    "company_type_detector", "crunchbase_cased", "crunchbase_uncased",
    "date_detector", "doc_history", "full_name_detector", "geo_cased",
    "geo_uncased", "legal_detector", "misc_detector", "money_detector",
    "number_detector", "product_cased", "product_uncased",
    "time_detector", "wiki_cased",
]


def doc_majority(doc: Doc) -> None:
    """Majority label per entity string across the document, emitted as
    cased + uncased layers (annotations.py:1126-1239)."""
    doc.clear("doc_majority_cased")
    doc.clear("doc_majority_uncased")

    # Weighted label votes per span (exact + overlap-ratio weighted).
    # A long web page carries hundreds of vote spans, and probing every
    # span against a from-zero scan of every source layer is O(S^2) —
    # the dominant cost of the whole annotator DAG on 1k-token docs. So
    # each source layer is sorted ONCE, and each probe bisects to the
    # first span that could still overlap (spans at s2 <= start-maxlen
    # end at e2 <= s2+maxlen <= start). The surviving candidates — and
    # therefore the float accumulation order — are identical to the
    # naive scan's.
    from bisect import bisect_left

    sorted_items = {
        source: sorted(doc.layers[source].items())
        for source in DOC_MAJORITY_SOURCES
        if doc.layers.get(source)
    }
    probe_meta = {
        source: ([iv[0] for iv, _ in items],
                 max(iv[1] - iv[0] for iv, _ in items))
        for source, items in sorted_items.items()
    }

    def _overlapping(start: int, end: int):
        out = []
        for source in DOC_MAJORITY_SOURCES:
            items = sorted_items.get(source)
            if not items:
                continue
            starts_list, maxlen = probe_meta[source]
            for idx in range(bisect_left(starts_list, start - maxlen + 1),
                             len(items)):
                iv, vals = items[idx]
                if iv[0] >= end:
                    break
                if start < iv[1]:
                    out.append((iv[0], iv[1], vals))
        return out

    span_labels: dict[Span, dict[str, float]] = {}
    for source in DOC_MAJORITY_SOURCES:
        layer = doc.layers.get(source)
        if not layer:
            continue
        for (start, end), vals in layer.items():
            acc = span_labels.setdefault((start, end), {})
            for label, conf in vals:
                acc[label] = acc.get(label, 0.0) + conf
            for s2, e2, vals2 in _overlapping(start, end):
                if (start, end) != (s2, e2):
                    overlap = (min(end, e2) - max(start, s2)) / (end - start)
                    for label2, conf2 in vals2:
                        acc[label2] = acc.get(label2, 0.0) + conf2 * overlap

    for span, counts in span_labels.items():
        total = sum(counts.values())
        span_labels[span] = {l: c / total for l, c in counts.items()}

    # Label votes per entity string.
    tokens = tuple(doc.tokens)
    entity_counts: dict[tuple[str, ...], dict[str, float]] = {}
    for (start, end), weighted in span_labels.items():
        key = tokens[start:end]
        acc = entity_counts.setdefault(key, {})
        for label, w in weighted.items():
            acc[label] = acc.get(label, 0.0) + w

    # Entities with >= 2 case-insensitive occurrences -> majority label.
    # Occurrence counting probes only the positions of the entity's
    # FIRST token (inverted index) instead of sliding over every doc
    # position per entity — same counts, O(n + hits) instead of O(E*n).
    lower_tokens = tuple(doc.lower)
    n_tok = len(lower_tokens)
    pos_by_tok: dict[str, list[int]] = {}
    for i, t in enumerate(lower_tokens):
        pos_by_tok.setdefault(t, []).append(i)
    trie = TokenTrie()
    for entity, counts in entity_counts.items():
        ent_lower = tuple(t.lower() for t in entity)
        elen = len(entity)
        occurrences = sum(
            1
            for i in pos_by_tok.get(ent_lower[0], ())
            if i + elen <= n_tok and lower_tokens[i : i + elen] == ent_lower
        )
        majority = max(
            counts,
            key=lambda x: counts[x] * 1000 + (1 if x in {"PRODUCT", "COMPANY"} else 0),
        )
        if occurrences > 1:
            trie.insert(entity, majority)

    if not len(trie):
        return  # both layers stay empty: no repeated entities in the doc

    n = len(tokens)
    for case_sensitive in (True, False):
        source = "doc_majority_" + ("cased" if case_sensitive else "uncased")
        layer = doc.layers[source]
        # The scan adds spans in ascending start order with length <= 8
        # (the lookahead), so the only existing spans that can overlap
        # position i live in the trailing window start > i-8 — checked
        # directly instead of re-sorting the growing layer per hit
        # (which made this loop quadratic in hits on long docs). Same
        # candidates, same ascending order, same delete/skip decisions
        # as the get_overlaps form.
        added: list[Span] = []
        for i in range(n):
            length, label = trie.longest_prefix_at(
                tokens, i, min(i + 8, n),
                None if case_sensitive else doc.alt_forms,
            )
            if label:
                lo = len(added)
                while lo > 0 and added[lo - 1][0] > i - 8:
                    lo -= 1
                compatible = True
                for s2, e2 in [sp for sp in added[lo:] if sp[1] > i]:
                    if e2 - s2 < length:
                        del layer[(s2, e2)]
                        added.remove((s2, e2))
                    else:
                        compatible = False
                        break
                if compatible:
                    doc.add(source, i, i + length, label)
                    added.append((i, i + length))


# ---------------------------------------------------------------------------
# Full per-document pipeline (ordering per annotations.py:261-373)
# ---------------------------------------------------------------------------

def annotate_document(doc: Doc, gazetteers: dict[str, TokenTrie], first_names: set[str]) -> Doc:
    """Run the complete ordered annotator DAG on one document."""
    # 1. Shallow pattern detectors
    for source, gen in (
        ("date_detector", date_generator),
        ("time_detector", time_generator),
        ("money_detector", money_generator),
    ):
        doc.clear(source)
        for s, e, lab in gen(doc):
            doc.add(source, s, e, lab)
    doc.clear("number_detector")
    for s, e, lab in number_generator(doc):
        doc.add("number_detector", s, e, lab,
                to_exclude=("date_detector", "time_detector", "money_detector"))

    # 2. Proper-span detectors (generic ENT labels, specialised later)
    for source, constraint in (
        ("proper_detector", proper_constraint),
        ("proper2_detector", proper2_constraint),
        ("nnp_detector", nnp_constraint),
        ("compound_detector", compound_constraint),
    ):
        doc.clear(source)
        for s, e, lab in span_generator(doc, constraint):
            doc.add(source, s, e, lab)
        infreq = "infrequent_" + source
        doc.clear(infreq)
        for (s, e), vals in doc.layers[source].items():
            if is_infrequent(doc, s, e):
                for lab, conf in vals:
                    doc.add(infreq, s, e, lab, conf)

    # 3. Structured detectors
    doc.clear("company_type_detector")
    for s, e, lab in company_type_generator(doc):
        doc.add("company_type_detector", s, e, lab)
    doc.clear("full_name_detector")
    for s, e, lab in full_name_generator(doc, first_names):
        doc.add("full_name_detector", s, e, lab)
    doc.clear("misc_detector")
    for s, e, lab in misc_generator(doc):
        doc.add("misc_detector", s, e, lab)
    doc.clear("legal_detector")
    for s, e, lab in legal_generator(doc):
        doc.add("legal_detector", s, e, lab)

    # 4. Gazetteers (cased + uncased) and multitoken constraint layers
    for gaz, trie in gazetteers.items():
        for case_sensitive in (True, False):
            source = f"{gaz}_{'cased' if case_sensitive else 'uncased'}"
            doc.clear(source)
            for s, e, lab, conf in gazetteer_hits(doc, trie, case_sensitive):
                doc.add(source, s, e, lab, conf)
            multi = "multitoken_" + source
            doc.clear(multi)
            for (s, e), vals in doc.layers[source].items():
                if e - s > 1:
                    for lab, conf in vals:
                        doc.add(multi, s, e, lab, conf)

    # 5. Document-level annotators (order: annotations.py:367-373)
    standardise(doc)
    doc_history(doc)
    doc_majority(doc)
    standardise(doc)
    return doc


def flatten_spans(doc: Doc) -> list[tuple[str, int, int, str, float]]:
    """Deterministically ordered long-form span list for one doc."""
    out = []
    for source in sorted(doc.layers):
        for (start, end) in sorted(doc.layers[source]):
            for label, conf in doc.layers[source][(start, end)]:
                out.append((source, start, end, label, float(conf)))
    return out
