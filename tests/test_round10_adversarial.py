"""Round-10 adversarial pins (round-9 ADVICE items).

1. tools/replicate_10x.py salt_text must COMMUTE WITH LOWERCASING:
   the shingler (_SHINGLE_SQL) lowercases raw text before shingling,
   so any character class the salt leaves un-rotated (round 9:
   uppercase A-Z) survives into the lowered shingles identically
   across copies — silently weakening the salted replica's
   "essentially disjoint shingle sets" duplicate-density claim that
   the 100x dedup-oracle battery relies on.
2. tools/drive_contract.py's final summary JSON must make a SUBSET
   run (EFS_ONLY / EFS_SKIP) distinguishable from a full-contract
   pass: before round 10 a green EFS_ONLY run printed the same
   total/failed=[] shape as a full pass in the ~2 KB tail capture.
"""
import sys

sys.path.insert(0, "/root/repo")


def test_salt_text_commutes_with_lowercasing(spark):
    """lower(salt_text(t, i)) == salt_text(lower(t), i) for mixed-case
    text — i.e. the rotation covers every character the shingler sees.
    Before the round-10 fix, uppercase letters passed through
    un-rotated ('AbZ9' @ i=1 -> 'AcZ0', lowering to 'acz0' instead of
    'bca0'), so salted copies of mixed-case documents kept shared
    lowered shingles."""
    from pyspark.sql import functions as F

    from tools.replicate_10x import salt_text

    rows = [("AbZ9 Quick-BROWN fox #42",), ("MiXeD Case 007",)]
    df = spark.createDataFrame(rows, ["text"])
    for i in (1, 7, 25):
        salted_then_lower = [
            r["text"]
            for r in salt_text(df, i)
            .select(F.lower("text").alias("text"))
            .collect()
        ]
        lower_then_salted = [
            r["text"]
            for r in salt_text(
                df.select(F.lower("text").alias("text")), i
            ).collect()
        ]
        assert salted_then_lower == lower_then_salted, i
        # and the rotation really changed the lowered text (disjointness
        # has teeth only if copies differ post-lowering)
        originals = [r[0].lower() for r in rows]
        assert salted_then_lower != originals, i


def test_salt_text_copy0_is_identity(spark):
    """Copy 0 must keep the original corpus verbatim (the replica's
    documented contract: the un-salted originals survive as copy 0)."""
    from tools.replicate_10x import salt_text

    df = spark.createDataFrame([("AbZ9 Quick-BROWN fox #42",)], ["text"])
    assert salt_text(df, 0).collect() == df.collect()


def test_drive_contract_summary_reports_subset_visibility():
    """Source-level pin (same style as the cast-ban lints): the summary
    JSON printed by tools/drive_contract.py must carry ran/skipped/
    efs_skip/efs_only alongside total/failed, so a green subset run
    can't be mistaken for a full pass in the driver tail capture."""
    src = open("/root/repo/tools/drive_contract.py").read()
    for key in ('"total"', '"ran"', '"skipped"', '"efs_skip"',
                '"efs_only"', '"oracled"', '"failed"'):
        assert key in src, key
    # the skipped tally must count BOTH fence mechanisms — the append
    # happens in the shared continue branch, before the skip-only print
    assert "skipped.append(name)" in src
