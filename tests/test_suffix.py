"""Suffix-rank / KMR fingerprint-doubling tests (operators/suffix.py):

- ordered suffix ranks verified against BRUTE-FORCE single-node dense
  ranking of actual prefix strings (independent math: Python sorted(),
  no doubling);
- the rank-free KMR label path cross-checked against the ordered path
  AND against direct substring counting;
- pad/separator safety on texts containing the pad characters;
- partitioning independence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import suffix
from e_commerce_lakehouse_spark.sources import load_table
from tests.conftest import SF_SMALL


def _brute_ranks(texts: dict[int, str], length: int) -> dict[tuple[int, int], int]:
    """Dense rank of every suffix's first ``length`` chars, by plain
    Python string sort (shorter-prefix-sorts-first matches the
    doubling's padding semantics for prefix-related strings)."""
    prefixes = {
        (d, p): t[p - 1 : p - 1 + length]
        for d, t in texts.items()
        for p in range(1, len(t) + 1)
    }
    order = {s: i + 1 for i, s in enumerate(sorted(set(prefixes.values())))}
    return {k: order[v] for k, v in prefixes.items()}


def _brute_rep_lengths(texts: dict[int, str], rounds: int) -> dict[int, int]:
    """Longest power-of-two L whose exact L-substring repeats anywhere
    in the corpus — counted directly over substrings."""
    out = {d: 0 for d in texts}
    for k in range(rounds + 1):
        length = 1 << k
        occ: dict[str, list[int]] = {}
        for d, t in texts.items():
            for p in range(len(t) - length + 1):
                occ.setdefault(t[p : p + length], []).append(d)
        for s, docs in occ.items():
            if len(docs) > 1 or len(set(docs)) < len(docs):
                for d in docs:
                    out[d] = max(out[d], length)
    return out


TEXTS = {
    1: "abcabcxy",
    2: "xyzzy",
    3: "abc",
    5: "qq",
    6: "a|b-c|a|b",  # pad ('-') and separator ('|') chars in real text
    7: "unique0123456789",
}


@pytest.fixture()
def docs(spark):
    rows = [(d, t) for d, t in TEXTS.items()] + [(4, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_suffix_ranks_match_brute_force(spark, docs):
    for rounds in (0, 1, 2, 3):
        got = {
            (r.doc_id, r.pos): r.rank
            for r in suffix.suffix_ranks(docs, rounds=rounds).collect()
        }
        assert got == _brute_ranks(TEXTS, 1 << rounds), f"rounds={rounds}"


def test_suffix_ranks_partitioning_independent(spark, docs):
    a = sorted(map(tuple, suffix.suffix_ranks(docs, rounds=2).collect()))
    b = sorted(
        map(tuple, suffix.suffix_ranks(docs.repartition(7), rounds=2).collect())
    )
    assert a == b


def test_repeated_prefix_lengths_match_substring_counting(spark, docs):
    got = {
        r.doc_id: r.sa_rep_len
        for r in suffix.repeated_prefix_lengths(docs, rounds=4).collect()
    }
    want = _brute_rep_lengths(TEXTS, 4)
    want[4] = None  # NULL text
    assert got == want


def test_kmr_labels_agree_with_ordered_ranks(spark):
    """The rank-free KMR path and the ordered suffix-rank path induce
    the SAME equivalence classes at every level on real testdata."""
    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    rounds = 3
    ranks = {
        (r.doc_id, r.pos): r.rank
        for r in suffix.suffix_ranks(docs, rounds=rounds).collect()
    }
    labels = {
        (r.doc_id, r.pos): r[f"h{rounds}"]
        for r in suffix.prefix_label_frame(docs, rounds=rounds)
        .select("doc_id", "pos", f"h{rounds}")
        .collect()
    }
    assert set(ranks) == set(labels)
    by_rank: dict[int, set] = {}
    by_label: dict[str, set] = {}
    for k, v in ranks.items():
        by_rank.setdefault(v, set()).add(k)
    for k, v in labels.items():
        by_label.setdefault(v, set()).add(k)
    assert sorted(map(sorted, by_rank.values())) == sorted(
        map(sorted, by_label.values())
    )


def test_rounds_guard(spark, docs):
    with pytest.raises(ValueError, match="rounds"):
        suffix.repeated_prefix_lengths(docs, rounds=-1)
