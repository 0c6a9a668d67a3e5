"""Multi-pattern dictionary tagging (Aho–Corasick) over the corpus.

Blocklist/taxonomy tagging — C4's bad-words filter, Dolma's taggers,
brand-safety lists — needs "which of these D phrases appear in each
document" where D reaches 10^4..10^6. A regex alternation compiles
O(D) NFA states and rescans from every position (worst-case O(n·D));
Aho–Corasick matches ALL patterns in one left-to-right pass over the
text, O(n + matches), independent of D.

Spark shape: the automaton is built ONCE from the phrase list (driver,
O(total pattern chars)), shipped as a broadcast via the Arrow UDF
closure, and each executor streams its document batches through it —
map-only, no shuffle, no per-row Python (one mapInPandas call per
Arrow batch). At 100 TB the dictionary rides the closure exactly like
a broadcast join's small side.

The automaton is the textbook construction (goto/fail/output, Aho &
Corasick 1975) in plain dicts — no external package, deterministic.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AhoCorasick:
    """goto/fail/output automaton over unicode code points."""

    def __init__(self, patterns: Sequence[str]):
        pats = sorted(set(p for p in patterns if p))
        if not pats:
            raise ValueError("need at least one non-empty pattern")
        self.patterns = pats
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(pats):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(idx)
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != s else 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def matches(self, text: str) -> Iterator[tuple[int, int]]:
        """Yield (end_position_exclusive, pattern_index) for every
        occurrence, in scan order (overlaps and nested hits included)."""
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for idx in self.out[s]:
                yield i + 1, idx


def dictionary_tag(
    documents: DataFrame,
    phrases: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document dictionary hit stats: total occurrence count,
    number of distinct phrases hit, and the sorted distinct phrases —
    one automaton pass per document, Arrow-batched.

    Matching is case-sensitive on raw code points (normalize upstream
    with cleaning.normalize_text for case-folded lists). Counting is
    occurrence-based like DuckDB/re's non-overlapping semantics ONLY
    for patterns that cannot overlap themselves; AC reports ALL
    occurrences including overlapping ones — the richer signal a
    filter wants (tests pin both the overlap and the plain case).
    """
    ac = AhoCorasick(phrases)
    pats = ac.patterns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            n_hits, n_distinct, hit_list = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    n_hits.append(0)
                    n_distinct.append(0)
                    hit_list.append("")
                    continue
                seen: dict[int, int] = {}
                for _, idx in ac.matches(t):
                    seen[idx] = seen.get(idx, 0) + 1
                n_hits.append(sum(seen.values()))
                n_distinct.append(len(seen))
                hit_list.append(",".join(pats[i] for i in sorted(seen)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_hits": pd.Series(n_hits, dtype="int64"),
                    "n_distinct": pd.Series(n_distinct, dtype="int64"),
                    "hits": hit_list,
                }
            )

    return documents.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_hits long, n_distinct long, hits string"
    )


def dictionary_phrase_stats(
    documents: DataFrame,
    phrases: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level hit report per dictionary phrase: how many docs
    contain it and how many times it occurs in total — the summary a
    blocklist owner reviews before enabling a filter. Zero-hit phrases
    ARE reported (a dead blocklist entry is a finding, not a blank).

    Same single automaton pass as :func:`dictionary_tag`, emitted in
    long format and aggregated with one tiny shuffle on the phrase id
    (at most |phrases| groups); the full phrase list joins back as a
    broadcast literal frame so zero rows survive.
    """
    ac = AhoCorasick(phrases)
    pats = ac.patterns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            idxs, counts = [], []
            for t in pdf[text_col]:
                seen: dict[int, int] = {}
                if t is not None:
                    for _, idx in ac.matches(t):
                        seen[idx] = seen.get(idx, 0) + 1
                for i, c in seen.items():
                    idxs.append(i)
                    counts.append(c)
            yield pd.DataFrame(
                {
                    "_pi": pd.Series(idxs, dtype="int64"),
                    "_n": pd.Series(counts, dtype="int64"),
                }
            )

    from .parallelize import spread_for_cpu

    spark = documents.sparkSession
    # ship ONLY the text column across the Arrow boundary (guide §4.1:
    # Spark cannot see which columns an opaque map touches — id_col was
    # serialized per row and never read), and spread an under-parallel
    # scan: the automaton walk is the heavy map before a |phrases|-row
    # shuffle (no-op at scale)
    hits = (
        spread_for_cpu(documents.select(text_col))
        .mapInPandas(run, schema="_pi long, _n long")
        .groupBy("_pi")
        .agg(
            F.count(F.lit(1)).alias("docs_with"),
            F.sum("_n").alias("n_occurrences"),
        )
    )
    plist = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pats)], "_pi long, phrase string"
    )
    return (
        plist.join(F.broadcast(hits), "_pi", "left")
        .select(
            "phrase",
            F.coalesce("docs_with", F.lit(0)).alias("docs_with"),
            F.coalesce("n_occurrences", F.lit(0)).alias("n_occurrences"),
        )
    )
