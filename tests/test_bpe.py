"""BPE exactness: the space-flank replace() encoding IS greedy-leftmost
non-overlapping pair merging, and the distributed trainer reproduces a
pure-Python reference BPE trainer end-to-end.

The suite oracle (tests/test_suite_oracle.py) proves Spark ≡ DuckDB, but
both engines share the replace() device — these tests pin the device (and
the whole trainer) against an INDEPENDENT list-based implementation, the
way test_image_ops pins phash64 against the per-row reference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pttcrawler_spark import suite

ALPHABET = ["a", "b", "c", "ab", "bc", "aa"]


def encode(syms: list[str]) -> str:
    """' s1  s2  ...  sn ' — single-space flanks, double-space separators."""
    return " " + "  ".join(syms) + " "


def merge_greedy(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Reference greedy-leftmost non-overlapping BPE pair merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def merge_via_replace(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """The engine/oracle device: literal replace on the encoded string."""
    x, y = pair
    enc = encode(syms).replace(f" {x}  {y} ", f" {x}{y} ")
    return enc.strip().split("  ")


@given(st.lists(st.sampled_from(ALPHABET), min_size=1, max_size=12),
       st.tuples(st.sampled_from(ALPHABET), st.sampled_from(ALPHABET)))
@settings(max_examples=500, deadline=None)
def test_replace_encoding_equals_greedy_merge(syms, pair):
    # multi-char alphabet entries deliberately overlap ('a'+'b' vs 'ab')
    # to exercise the boundary-safety claim, and repeated symbols the
    # overlap claim ('a a a a' -> 'aa aa', never 'aa a a').
    assert merge_via_replace(syms, pair) == merge_greedy(syms, pair)


def _reference_bpe_train(word_freq: dict[str, int], iters: int):
    """Pure-Python BPE trainer (Sennrich et al. 2016 alg. 1): symbol
    lists + greedy-leftmost merging, tie-break (count desc, encoded-pair
    string asc) — exactly the engine's rule."""
    segs = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(iters):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_freq[w]
        if not counts:
            break
        best = min(counts.items(),
                   key=lambda kv: (-kv[1], encode(list(kv[0]))))
        merges.append(best[0])
        segs = {w: merge_greedy(s, best[0]) for w, s in segs.items()}
    return segs, merges


def test_bpe_train_matches_reference_trainer(spark):
    """End-to-end: the distributed trainer's per-word segmentations equal
    the pure-Python trainer's on the same corpus."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    wf = duckdb.sql(
        f"""SELECT w, count(*) AS c FROM (
              SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM read_parquet('{sf}/documents.parquet'))
            WHERE length(w) >= 1 GROUP BY w""").fetchall()
    word_freq = {w: c for w, c in wf}
    segs, merges = _reference_bpe_train(word_freq, suite._BPE_ITERS)
    assert len(merges) == suite._BPE_ITERS

    got = {r["word"]: (r["freq"], r["n_tokens"], r["seg"])
           for r in suite.bpe_train_merges(spark, sf).collect()}
    assert set(got) == set(word_freq)
    for w, (freq, n_tokens, seg) in got.items():
        assert freq == word_freq[w], w
        assert n_tokens == len(segs[w]), w
        assert seg == encode(segs[w]), w


def test_bpe_flatten_equivalence(spark):
    """The merge-depth scale path (flatten_every: materialize the encoding
    into the checkpointed vocab and reset the replace() chain) is pure
    materialization — merge picks and final segmentations are bit-identical
    to the unflattened loop at a depth where flattening fires repeatedly,
    and both match the pure-Python reference trainer at that depth."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    iters = 7  # flatten_every=2 fires 3 times mid-loop

    vocab_n, enc_n = suite._bpe_learn(spark, sf, iters=iters,
                                      flatten_every=0)
    vocab_f, enc_f = suite._bpe_learn(spark, sf, iters=iters,
                                      flatten_every=2)
    import pyspark.sql.functions as F
    segs_n = {r["w"]: r["seg"] for r in
              vocab_n.select("w", enc_n.alias("seg")).collect()}
    segs_f = {r["w"]: r["seg"] for r in
              vocab_f.select("w", enc_f.alias("seg")).collect()}
    assert segs_n == segs_f

    wf = duckdb.sql(
        f"""SELECT w, count(*) AS c FROM (
              SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM read_parquet('{sf}/documents.parquet'))
            WHERE length(w) >= 1 GROUP BY w""").fetchall()
    segs_ref, _ = _reference_bpe_train({w: c for w, c in wf}, iters)
    assert segs_f == {w: encode(s) for w, s in segs_ref.items()}
