"""Substring-level dedup: planted embedded duplicates, exact equality
with a pure-Python reference of the same algorithm on random corpora,
and the density=1 no-shared-kgram guarantee."""

from __future__ import annotations

import hashlib
import random

from knightshift_spark.operators.substring import (
    duplicated_spans,
    strip_duplicated_spans,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_reference(rows, k, density, merge_gap=0):
    """Same algorithm, straight Python: anchors → global first
    occurrence → merged spans → cut."""
    first_seen = {}
    spans = {i: [] for i, _ in rows}
    for i, t in sorted(rows):
        for p in range(len(t) - k + 1):
            g = t[p : p + k]
            if _h32(g) % density:
                continue
            if g in first_seen:
                spans[i].append((p, p + k - 1))  # 0-based window
            else:
                first_seen[g] = (i, p)
    out = {}
    for i, t in rows:
        merged = []
        for s, e in sorted(spans[i]):
            if merged and s <= merged[-1][1] + 1 + merge_gap:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        keep, last = [], -1
        for s, e in merged:
            keep.append(t[last + 1 : s])
            last = max(last, e)
        keep.append(t[last + 1 :])
        out[i] = "".join(keep)
    return out


def _spark_strip(spark, rows, k, density, merge_gap=0):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["text"]
        for r in strip_duplicated_spans(
            docs, k=k, density=density, merge_gap=merge_gap
        ).collect()
    }


def test_planted_embedded_duplicate_removed(spark):
    boiler = "COPYRIGHT NOTICE all rights reserved do not redistribute!"
    rows = [
        (1, f"unique first document text . {boiler} . and a unique tail"),
        (2, f"another document entirely ; {boiler} ; different ending here"),
        (3, "a document with no duplicated content whatsoever in it"),
    ]
    got = _spark_strip(spark, rows, k=20, density=1)
    assert got[1] == rows[0][1]  # first occurrence keeps its text
    assert boiler not in got[2]  # later copy stripped
    assert got[2].startswith("another document entirely ;")
    assert got[3] == rows[2][1]  # untouched doc passes through


def test_matches_python_reference_on_random_corpus(spark):
    rng = random.Random(42)
    words = [f"w{j}" for j in range(30)]
    shared = " ".join(rng.choices(words, k=12))
    rows = []
    for i in range(8):
        body = " ".join(rng.choices(words, k=40))
        if i % 2:
            cut = rng.randrange(len(body))
            body = body[:cut] + " " + shared + " " + body[cut:]
        rows.append((i, body))
    for density in (1, 4):
        want = _py_reference(rows, k=15, density=density, merge_gap=3)
        got = _spark_strip(spark, rows, k=15, density=density, merge_gap=3)
        assert got == want, f"density={density}"


def test_density_one_guarantee_no_cross_doc_kgram_survives(spark):
    """With density=1 every duplicated k-gram is an anchor, so no k-gram
    of a LATER output may also appear in an EARLIER original."""
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    shared = "".join(rng.choices(alphabet, k=60))
    rows = [
        (1, "".join(rng.choices(alphabet, k=80)) + shared),
        (2, shared + "".join(rng.choices(alphabet, k=80))),
        (3, "".join(rng.choices(alphabet, k=40)) + shared[:30]),
    ]
    k = 12
    got = _spark_strip(spark, rows, k=k, density=1)
    earlier_grams = set()
    for i, original in sorted(rows):
        out = got[i]
        own = {original[p : p + k] for p in range(len(original) - k + 1)}
        out_grams = {out[p : p + k] for p in range(len(out) - k + 1)}
        # true survivors = output grams that existed in this doc's
        # original (grams newly FORMED across cut boundaries excluded);
        # none of them may duplicate anything seen in earlier docs
        leaked = (out_grams & own) & earlier_grams
        assert leaked == set(), (i, sorted(leaked)[:3])
        earlier_grams |= own
    # and the spans the engine reports are where the shared text was
    spans = duplicated_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=k, density=1
    )
    assert {r["doc_id"] for r in spans.collect()} == {2, 3}


def test_incremental_index_equals_one_shot(spark, tmp_path):
    """Batching the corpus through (strip_against_index + append) in id
    order must produce EXACTLY strip_duplicated_spans of the whole
    corpus — the incremental path is the one-shot path, paid per batch."""
    from knightshift_spark.operators.substring import (
        strip_against_index,
        write_anchor_index,
    )

    rng = random.Random(11)
    words = [f"t{j}" for j in range(25)]
    shared = " ".join(rng.choices(words, k=10))
    rows = []
    for i in range(9):
        body = " ".join(rng.choices(words, k=30))
        if i % 3 != 2:
            cut = rng.randrange(len(body))
            body = body[:cut] + " " + shared + " " + body[cut:]
        rows.append((i, body))
    k, density = 12, 2

    one_shot = _spark_strip(spark, rows, k=k, density=density)

    idx = str(tmp_path / "anchors")
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_anchor_index(empty, idx, k=k, density=density)
    got = {}
    for lo in range(0, 9, 3):
        batch = spark.createDataFrame(rows[lo : lo + 3], "doc_id long, text string")
        out = strip_against_index(batch, idx)
        got.update({r["doc_id"]: r["text"] for r in out.collect()})
    assert got == one_shot
    # replaying a batch with append=False must not grow the index
    n_before = spark.read.schema("gram string").parquet(idx).count()
    strip_against_index(
        spark.createDataFrame(rows[:3], "doc_id long, text string"),
        idx, append=False,
    ).collect()
    assert spark.read.schema("gram string").parquet(idx).count() == n_before


def test_return_fresh_split_path_equals_fused(spark, tmp_path):
    """ADVICE r7: the corpus-first/index-second split —
    strip_against_index(append=False, return_fresh=True) followed by
    append_novel_grams(grams=...) — must leave the SAME stripped text
    and the SAME index as the fused append=True call, without
    re-anchoring the batch."""
    from knightshift_spark.operators.substring import (
        append_novel_grams,
        strip_against_index,
        write_anchor_index,
    )

    rng = random.Random(23)
    words = [f"w{j}" for j in range(20)]
    shared = " ".join(rng.choices(words, k=8))
    rows = [
        (i, " ".join(rng.choices(words, k=25)) + " " + shared)
        for i in range(6)
    ]
    k, density = 10, 2

    def run(split: bool):
        idx = str(tmp_path / f"idx_{split}")
        empty = spark.createDataFrame([], "doc_id long, text string")
        write_anchor_index(empty, idx, k=k, density=density)
        texts = {}
        for lo in (0, 3):
            batch = spark.createDataFrame(
                rows[lo : lo + 3], "doc_id long, text string"
            )
            if split:
                out, fresh = strip_against_index(
                    batch, idx, append=False, return_fresh=True
                )
                texts.update({r["doc_id"]: r["text"] for r in out.collect()})
                append_novel_grams(batch, idx, grams=fresh)
            else:
                out = strip_against_index(batch, idx)
                texts.update({r["doc_id"]: r["text"] for r in out.collect()})
        grams = {
            r["gram"]
            for r in spark.read.schema("gram string").parquet(idx).collect()
        }
        return texts, grams

    fused_texts, fused_grams = run(split=False)
    split_texts, split_grams = run(split=True)
    assert split_texts == fused_texts
    assert split_grams == fused_grams
