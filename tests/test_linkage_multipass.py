"""Multi-pass blocked fuzzy join (VERDICT r9 #4): known-value recovery
of single-pass blocking misses, and the measured recall delta on the
real part corpus at sf0.01."""

from pyspark.sql import functions as F

from fmx.operators.linkage import blocked_fuzzy_join, blocked_fuzzy_join_multipass

SF001 = "/root/testdata/sf0.01"


def test_multipass_recovers_prefix_typo(spark):
    """A first-char typo escapes the (prefix, length-band) block but the
    suffix pass recovers it; exact and in-block matches are unchanged,
    and n_cands counts the DEDUPLICATED candidate row set."""
    right = spark.createDataFrame(
        [(1, "red widget"), (2, "red widgets"), (3, "blue bolt")],
        "rid long, name string")
    left = spark.createDataFrame(
        [(10, "red widgit"),    # in-block: both passes find it
         (11, "xed widget"),    # first-char typo: suffix pass only
         (12, "blue bolt")],    # exact
        "lid long, pname string")
    out = {r.lid: (r.rid, r.dist, r.n_cands)
           for r in blocked_fuzzy_join_multipass(
               left, right, "lid", "rid", "pname", "name",
               max_dist=3).collect()}
    # 10: prefix pass gives {1, 2}; suffix pass ("dgit" vs "dget"/
    # "gets"/"bolt") adds nothing -> 2 deduped candidates, widget wins.
    assert out[10] == (1, 1, 2)
    # 11: single-pass miss (test_blocked_fuzzy_join_known_values), but
    # suffix "dget" matches "red widget" -> recovered at dist 1.
    assert out[11] == (1, 1, 1)
    assert out[12] == (3, 0, 1)      # both passes yield the same 1 cand
    # single-pass on the same inputs really does miss 11 (the delta)
    single = blocked_fuzzy_join(left, right, "lid", "rid", "pname",
                                "name", block_prefix=1, length_band=4,
                                max_dist=3)
    assert {r.lid for r in single.collect()} == {10, 12}


def test_multipass_duplicate_right_rows_count_once(spark):
    """A right name reachable through BOTH passes contributes its row
    multiplicity exactly once to n_cands."""
    right = spark.createDataFrame(
        [(1, "red widget"), (2, "red widget"), (3, "red widget")],
        "rid long, name string")
    left = spark.createDataFrame([(10, "red widgit")],
                                 "lid long, pname string")
    out = blocked_fuzzy_join_multipass(
        left, right, "lid", "rid", "pname", "name").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.rid, r.dist, r.n_cands) == (1, 1, 3)   # min id, 3 rows once


def test_multipass_recall_delta_sf001(spark):
    """The measured recall gain the query docstring claims, pinned at
    the driver's sf0.01: single-pass 1585/2000 matched probes,
    multi-pass 1989/2000 (the drop-one-char corruption crosses the
    length band on length%4==0 names; the suffix pass recovers all of
    them except drops landing inside the last-4 window)."""
    part = spark.read.parquet(f"{SF001}/part.parquet")
    probes = part.select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(
            F.expr("substring(p_name, 1, 1 + (p_partkey % 4))"),
            F.expr("substring(p_name, CAST(3 + (p_partkey % 4) AS INT), "
                   "length(p_name))")).alias("probe_name"))
    clean = part.select(F.col("p_partkey").alias("part_id"), "p_name")
    single = blocked_fuzzy_join(
        probes, clean, "probe_id", "part_id", "probe_name", "p_name",
        block_prefix=1, length_band=4, max_dist=3).count()
    multi = blocked_fuzzy_join_multipass(
        probes, clean, "probe_id", "part_id", "probe_name", "p_name",
        max_dist=3).count()
    assert single == 1585
    assert multi == 1989
    assert multi > single            # the recall gain is real


def test_fs_multipass_recall_ledger(spark):
    """Exact recall accounting for the three FS blocking variants on
    the sf0.01 customer corpus (r10 verdict #4): the corruption is
    key-derived, so the set of recoverable true pairs is a closed-form
    function of custkey divisibility — assert each variant's total
    n_true equals its formula, and that multipass strictly dominates
    scaled (recovering both the tail-corrupted %11 and the
    nation-corrupted %5 probes unless band %3 is also corrupted)."""
    import fmx.queries as Q

    rows = (spark.read.parquet(f"{SF001}/customer.parquet")
            .select("c_custkey",
                    F.expr("substring(c_name, length(c_name)-1, 2)")
                    .alias("tail")).collect())
    # the %11 tail reversal is a NO-OP on palindromic tails ("00".."99")
    # — those probes still carry the clean tail and block normally
    pairs = [(r.c_custkey, r.tail == r.tail[::-1]) for r in rows]
    want = {
        # base: blocked on corrupted nation — lose %5
        "er_fellegi_sunter": sum(1 for k, _ in pairs if k % 5),
        # scaled: (nation, tail) — lose %5 or effectively-corrupted %11
        "er_fellegi_sunter_scaled":
            sum(1 for k, palin in pairs
                if k % 5 and (k % 11 or palin)),
        # multipass: pass1 (nation, tail) OR pass2 (mid, band) — lose
        # only probes failing BOTH: pass1's loss set and band %3
        "er_fellegi_sunter_multipass":
            sum(1 for k, palin in pairs
                if (k % 5 and (k % 11 or palin)) or k % 3),
    }
    got = {}
    for name, expected in want.items():
        out = Q.all_queries()[name].fn(spark, SF001)
        got[name] = out.agg(F.sum("n_true")).collect()[0][0]
        assert got[name] == expected, (name, got[name], expected)
    assert (got["er_fellegi_sunter_multipass"]
            > got["er_fellegi_sunter_scaled"])
    assert (got["er_fellegi_sunter_multipass"]
            > got["er_fellegi_sunter"])
