"""Pure-Python Aho-Corasick automaton + the reference's greedy span filter.

Built once on the driver from the surface-form dimension table, pickled,
`sc.broadcast`-ed, and applied inside Arrow-batched pandas UDFs (see
operators/spotting.py). No third-party automaton library is assumed.

Semantics mirror the reference spotter
(core/.../spot/ahocorasick/AhoCorasickSpotter.scala):
  * case-insensitive option lowercases transitions only; the emitted
    surface form is the text exactly as it appears (fromSurfaceForms
    :179-184 — `new SurfaceForm(result.actual)`).
  * overlap=False applies a greedy leftmost-longest filter (:118-153):
    sort matches by (start asc, length desc); keep a match iff it is
    word-bounded on both sides (boundary charset :35) AND starts strictly
    after the previously kept match ends (:135-145).
"""

from __future__ import annotations

from collections import deque

# single-char boundary set from AhoCorasickSpotter.scala:35
# pattern "\\s|\\n|\\t|[,.:;¿?¡!()\\-'\"]"
BOUNDARY_CHARS = frozenset(" \t\n\r\f\v ,.:;¿?¡!()-'\"")


def is_boundary(ch: str) -> bool:
    return ch in BOUNDARY_CHARS or ch.isspace()


class AhoCorasick:
    """Array-based Aho-Corasick over characters; picklable for broadcast."""

    __slots__ = ("goto", "fail", "out", "case_sensitive")

    def __init__(self, patterns, case_sensitive: bool = False):
        self.case_sensitive = case_sensitive
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[tuple[int, ...]] = [()]  # pattern lengths ending here
        seen = set()
        for pat in patterns:
            if not pat:
                continue
            key = pat if case_sensitive else pat.lower()
            if key in seen:
                continue
            seen.add(key)
            node = 0
            for ch in key:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[node][ch] = nxt
                    self.goto.append({})
                    self.out.append(())
                node = nxt
            self.out[node] = self.out[node] + (len(key),)
        # BFS fail links; merge outputs along fail chain so every match
        # is emitted at its end position.
        self.fail = [0] * len(self.goto)
        q = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                f = self.goto[f].get(ch, 0)
                if f == child:
                    f = 0
                self.fail[child] = f
                if self.out[f]:
                    self.out[child] = self.out[child] + self.out[f]

    def find_all(self, text: str) -> list[tuple[int, int]]:
        """All (start, length) matches, every occurrence of every pattern."""
        hay = text if self.case_sensitive else text.lower()
        node = 0
        res: list[tuple[int, int]] = []
        goto = self.goto
        fail = self.fail
        out = self.out
        for i, ch in enumerate(hay):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for ln in out[node]:
                    res.append((i - ln + 1, ln))
        return res


def greedy_filter(
    matches: list[tuple[int, int]], text: str
) -> list[tuple[int, int]]:
    """Leftmost-longest non-overlapping word-bounded filter
    (AhoCorasickSpotter.scala:118-153)."""
    n = len(text)
    kept: list[tuple[int, int]] = []
    prev_end = -1  # start must be strictly greater than previous end
    for start, ln in sorted(matches, key=lambda m: (m[0], -m[1])):
        end = start + ln
        if start != 0 and not is_boundary(text[start - 1]):
            continue
        if end < n and not is_boundary(text[end]):
            continue
        if kept and start <= prev_end:
            continue
        kept.append((start, ln))
        prev_end = end
    return kept


def spot_text(
    automaton: AhoCorasick, text: str, overlap: bool = False
) -> list[tuple[int, int]]:
    """(start, length) spots for one document text."""
    matches = automaton.find_all(text)
    if overlap:
        return sorted(matches)
    return greedy_filter(matches, text)
