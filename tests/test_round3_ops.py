"""Round-3 operators: KS two-sample drift and containment dedup."""

import hashlib

from pyspark.sql import Row, functions as F

from shifts_etl_spark.operators.dedup import containment_pairs
from shifts_etl_spark.operators.profile import ks_two_sample


def _bucket(i: int) -> int:
    """The x24 content-hash bucket, mirrored in pure Python."""
    hx = hashlib.md5(str(i).encode()).hexdigest()
    return (ord(hx[0]) * 256 + ord(hx[1])) % 100


def test_ks_matches_python_reference(spark):
    """D from the distributed two-pass CDF equals a plain-Python KS over
    the same md5 halves — guards the split rule, the <=v CDF semantics,
    and the integer-exact cumulative counts."""
    vals = [(i, float(v)) for i, v in enumerate([5, 3, 9, 1, 7, 3, 8, 2, 6, 4] * 30)]
    df = spark.createDataFrame(vals, "id bigint, v double")
    got = ks_two_sample(df, "v", "id").collect()[0]

    a = sorted(v for i, v in vals if _bucket(i) < 50)
    b = sorted(v for i, v in vals if _bucket(i) >= 50)
    assert got.n_a == len(a) and got.n_b == len(b)
    points = sorted(set(a) | set(b))
    best, best_at = -1.0, None
    for p in points:
        d = abs(
            sum(1 for x in a if x <= p) / len(a)
            - sum(1 for x in b if x <= p) / len(b)
        )
        if d > best + 1e-15:
            best, best_at = d, p
    # operator output is rounded to 6 dp
    assert abs(got.ks_stat - best) < 5.1e-7
    assert got.at_value == best_at


def test_ks_identical_halves_near_zero(spark):
    """Same distribution in both halves → small D (sampling noise only)."""
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 10).cast("double").alias("v")
    )
    got = ks_two_sample(df, "v", "id").collect()[0]
    assert got.ks_stat < 0.1


def test_ks_planted_shift_detected(spark):
    """Shift B's values by +100 → disjoint supports → D = 1.0."""
    rows = [
        Row(id=i, v=float(i % 10) + (100.0 if _bucket(i) >= 50 else 0.0))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    got = ks_two_sample(df, "v", "id").collect()[0]
    assert got.ks_stat == 1.0


def test_containment_catches_embedded_quote(spark):
    """A short doc fully embedded in a long doc: containment 1.0 even
    though Jaccard is far below any near-dup threshold."""
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i} word{i} token{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=quote),
            Row(doc_id=2, text=filler + " " + quote + " " + filler),
            Row(doc_id=3, text="совершенно unrelated text about nothing at all"),
        ]
    )
    out = containment_pairs(docs, min_df=2, max_df=5).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    hit = pairs[(1, 2)]
    assert hit.containment == 1.0
    assert hit.size_a < hit.size_b
    # jaccard for the same pair would be tiny: intersection == size_a
    assert hit.n_inter / (hit.size_a + hit.size_b - hit.n_inter) < 0.2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_containment_threshold_filters(spark):
    """Pairs sharing a rare shingle but below the overlap threshold are
    dropped."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta"),
            Row(doc_id=2, text="alpha beta gamma totally different tail here now"),
        ]
    )
    strict = containment_pairs(docs, threshold=0.9).collect()
    assert strict == []
    loose = containment_pairs(docs, threshold=0.1).collect()
    assert len(loose) == 1


def test_snapshot_diff_statuses(spark):
    """Planted added/removed/changed/unchanged rows classify exactly."""
    from shifts_etl_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")]
    )
    new = spark.createDataFrame(
        [Row(id=2, v="b"), Row(id=3, v="CHANGED"), Row(id=4, v="d")]
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # id=2 unchanged → absent


def test_table_checksum_order_and_partition_independent(spark):
    """Same content in any row order / partitioning → same checksum;
    one changed cell → different checksum, same count."""
    from shifts_etl_spark.operators.reconcile import table_checksum

    rows = [Row(id=i, v=f"val{i}") for i in range(100)]
    a = spark.createDataFrame(rows).repartition(8)
    b = spark.createDataFrame(list(reversed(rows))).repartition(3)
    ca = table_checksum(a, ["id", "v"]).collect()[0]
    cb = table_checksum(b, ["id", "v"]).collect()[0]
    assert (ca.n_rows, ca.checksum) == (cb.n_rows, cb.checksum)

    mutated = [Row(id=i, v=("XX" if i == 42 else f"val{i}")) for i in range(100)]
    cm = table_checksum(spark.createDataFrame(mutated), ["id", "v"]).collect()[0]
    assert cm.n_rows == ca.n_rows and cm.checksum != ca.checksum


# ---------------------------------------------------------------------------
# property-style invariants (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_ROWS = st.lists(
    st.tuples(st.integers(0, 50), st.text("ab", min_size=0, max_size=3)),
    min_size=0, max_size=25,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old_rows=_ROWS, new_rows=_ROWS)
def test_snapshot_diff_matches_dict_reference(spark, old_rows, new_rows):
    """For ANY pair of keyed snapshots (last-write-wins per key), the
    diff equals the plain-dict reconstruction."""
    from shifts_etl_spark.operators.reconcile import snapshot_diff

    old_d = {k: v for k, v in old_rows}
    new_d = {k: v for k, v in new_rows}
    old = spark.createDataFrame(list(old_d.items()) or [(None, None)],
                                "id int, v string").where("id is not null")
    new = spark.createDataFrame(list(new_d.items()) or [(None, None)],
                                "id int, v string").where("id is not null")
    got = {r.id: r.status for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
    want = {}
    for k in set(old_d) | set(new_d):
        if k not in new_d:
            want[k] = "removed"
        elif k not in old_d:
            want[k] = "added"
        elif old_d[k] != new_d[k]:
            want[k] = "changed"
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(st.tuples(st.integers(0, 1_000_000),
                               st.text("xyz", max_size=4)),
                     min_size=1, max_size=30, unique_by=lambda t: t[0]))
def test_table_checksum_equals_python_xor(spark, rows):
    """Checksum equals the hashlib reconstruction for ANY keyed rows."""
    import hashlib

    from shifts_etl_spark.operators.reconcile import table_checksum

    df = spark.createDataFrame(rows, "id long, v string")
    got = table_checksum(df, ["id", "v"]).collect()[0]
    want = 0
    for i, v in rows:
        hx = hashlib.md5(f"{i}\x1f{v}#row".encode()).hexdigest()[:12]
        want ^= int(hx, 16)
    assert got.n_rows == len(rows) and got.checksum == want


def test_driver_verified_set_parses_correctness_files():
    """The self-maintaining verified set must reproduce every green row
    of the driver's CORRECTNESS_r*.json files (and nothing that isn't a
    catalog entry), so future rounds never ship a stale hand list.
    Round 5 made the set round-aware: a name whose semantics changed in
    round N stays unverified until a round-N+ file re-greens it."""
    from shifts_etl_spark.plans.catalog import (
        CATALOG,
        _DRIVER_VERIFIED,
        _SEMANTICS_CHANGED_IN,
        _driver_green_rounds,
    )

    green = _driver_green_rounds()
    assert green  # the repo root carries r01+r02 at minimum
    assert set(green) <= set(CATALOG)
    # every green row counts as verified unless its semantics changed in
    # a later round than its newest green file
    for name, rnd in green.items():
        stale = _SEMANTICS_CHANGED_IN.get(name, 0) > rnd
        assert (name in _DRIVER_VERIFIED) == (not stale), (name, rnd)
    # rows-only entries can never be driver-green
    assert all(CATALOG[n].oracle is not None for n in green)
    # round numbers parsed from filenames are sane
    assert all(1 <= r <= 50 for r in green.values())


def test_audio_energy_silence_and_peak(spark):
    """Constant-byte blob → rms 0 everywhere, silence 1.0; a loud second
    window must move the peak and break silence there."""
    from shifts_etl_spark.operators.multimodal import audio_window_energy

    quiet = bytes([128] * 256)
    loud = bytes([128] * 128 + [228, 28] * 64)
    df = spark.createDataFrame(
        [(1, quiet), (2, loud), (3, bytes([128] * 100))],  # 3: sub-window → no row
        "doc_id long, blob binary",
    )
    got = {r.doc_id: r for r in audio_window_energy(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_windows == 2 and got[1].mean_rms == 0.0
    assert got[1].silence_frac == 1.0 and got[1].peak_window == 0
    assert got[2].peak_window == 1 and got[2].peak_rms == 100.0
    assert got[2].silence_frac == 0.5
    assert got[2].mean_rms == 50.0


def test_minhash_calibration_bounds(spark):
    """On a corpus of exact duplicates the estimate is exact (mae 0);
    invariants mae <= max_abs_err and |bias| <= mae always hold."""
    from shifts_etl_spark.plans.extensions import x83_minhash_calibration
    # patch the family module whose globals x83 resolves `_t` from
    from shifts_etl_spark.plans.extensions import dedup as ext

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=base) for i in range(4)]
        + [Row(doc_id=10 + i, text=f"unrelated filler {i} " * 8) for i in range(3)]
    )
    orig = ext._t
    ext._t = lambda _s, _d, _t: docs
    try:
        got = x83_minhash_calibration(spark, "ignored").collect()[0]
    finally:
        ext._t = orig
    assert got.n_pairs >= 6  # the 4 exact dups pair up
    assert got.mae <= got.max_abs_err
    assert abs(got.mean_bias) <= got.mae + 1e-9
    # exact duplicates dominate: identical signatures → est == exact == 1
    assert got.mae < 0.2
