"""Token-level trie for gazetteer matching.

Same capability as the reference trie (utils.py:7-98): longest-prefix
search over token sequences with an optional case-insensitive mode
(title/lower/upper alternatives per token), tuple values for
ambiguous entries. Implementation is nested plain dicts (one dict per
node, value under a sentinel key) — cheap to build on the driver and
to ship via ``sc.broadcast`` (the broadcast-hash-join analogue for
dictionary automata, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Iterator

_VALUE = 0  # sentinel key (ints never collide with str token keys)


class TokenTrie:
    __slots__ = ("root", "size")

    def __init__(self) -> None:
        self.root: dict = {}
        self.size = 0

    def insert(self, key: tuple[str, ...], value: Any) -> None:
        node = self.root
        for tok in key:
            node = node.setdefault(tok, {})
        if _VALUE not in node:
            self.size += 1
        node[_VALUE] = value

    def add_class(self, key: tuple[str, ...], ne_class: str) -> None:
        """Insert with tuple-of-classes merging (annotations.py:695-698)."""
        cur = self.get(key)
        if cur is None:
            self.insert(key, (ne_class,))
        elif ne_class not in cur:
            self.insert(key, (*cur, ne_class))

    def get(self, key: tuple[str, ...]) -> Any:
        node = self.root
        for tok in key:
            node = node.get(tok)
            if node is None:
                return None
        return node.get(_VALUE)

    def __contains__(self, key: tuple[str, ...]) -> bool:
        return self.get(key) is not None

    def __len__(self) -> int:
        return self.size

    def longest_prefix(
        self, tokens, case_sensitive: bool = True
    ) -> tuple[int, Any]:
        """Longest prefix of ``tokens`` present in the trie.

        Returns (prefix_length_in_tokens, value); (0, None) if no hit.
        Case-insensitive mode tries the exact form first, then
        title/lower/upper alternatives (utils.py:31-42 semantics).
        """
        alts = (
            None if case_sensitive
            else [(t.title(), t.lower(), t.upper()) for t in tokens]
        )
        return self.longest_prefix_at(tokens, 0, len(tokens), alts)

    def longest_prefix_at(
        self, tokens, start: int, stop: int, alts=None
    ) -> tuple[int, Any]:
        """Hot-path form of :meth:`longest_prefix`: walks
        ``tokens[start:stop]`` WITHOUT slicing the list (the scan calls
        this at every document position), and takes the per-token
        case alternatives precomputed once per doc (``Doc.alt_forms``)
        instead of allocating three strings per visited token per
        uncased gazetteer. ``alts=None`` = case-sensitive.

        LOCKSTEP NOTE: labelling.gazetteer_hits inlines this method's
        FIRST-token lookup (exact token in root, else alt forms with
        alt != tok) as a pre-call gate — if the matching rule here ever
        changes (token normalization, alt ordering, trying alts when
        the exact token IS present), update the gate or it will prune
        positions this method would match. Pinned by
        tests/test_trie.py::test_gazetteer_root_gate_matches_ungated_scan."""
        node = self.root
        value = None
        length = 0
        get = node.get
        for i in range(start, stop):
            tok = tokens[i]
            nxt = get(tok)
            if nxt is None and alts is not None:
                for alt in alts[i]:
                    if alt != tok:
                        nxt = get(alt)
                        if nxt is not None:
                            break
            if nxt is None:
                break
            node = nxt
            get = node.get
            if _VALUE in node:
                value = node[_VALUE]
                length = i - start + 1
        return length, value

    def items(self) -> Iterator[tuple[tuple[str, ...], Any]]:
        stack: list[tuple[tuple[str, ...], dict]] = [((), self.root)]
        while stack:
            prefix, node = stack.pop()
            if _VALUE in node:
                yield prefix, node[_VALUE]
            for k, child in node.items():
                if k != _VALUE:
                    stack.append(((*prefix, k), child))
