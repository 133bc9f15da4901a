"""The bench <-> catalog coverage manifest must stay complete and
fresh (round-9 VERDICT task 4): every catalog entry is accounted for
exactly once — identity-benched, variant-benched, or explicitly
not-benched with a reason — and the committed BENCH_MANIFEST.md
matches regeneration so the 2x perf gate's surface is auditable."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _buckets():
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from spark_tsne_spark.plans.bench_manifest import buckets

    return buckets()


def test_every_catalog_entry_is_mapped():
    from spark_tsne_spark.plans.queries import _REGISTRY

    identity, variants, nb = _buckets()
    covered = set(identity.values()) | set(variants.values())
    unmapped = sorted(set(_REGISTRY) - covered - set(nb))
    assert not unmapped, f"catalog entries silently unbenched: {unmapped}"


def test_every_bench_entry_is_mapped():
    import bench

    identity, variants, _ = _buckets()
    bq = set(bench.bench_queries())
    unmapped = sorted(bq - set(identity) - set(variants))
    assert not unmapped, f"bench entries with no catalog mapping: {unmapped}"


def test_no_stale_rows():
    """A NOT_BENCHED key that became benched, a variant pointing at a
    dead bench or catalog name, or an entry claimed twice are all
    staleness bugs the manifest must fail loudly on."""
    import bench

    from spark_tsne_spark.plans.queries import _REGISTRY

    identity, variants, nb = _buckets()
    bq = set(bench.bench_queries())
    benched_cat = set(identity.values()) | set(variants.values())
    # not-benched keys must exist and must genuinely not be benched
    stale_nb = sorted(
        k for k in nb if k not in _REGISTRY or k in benched_cat
    )
    assert not stale_nb, f"stale NOT_BENCHED rows: {stale_nb}"
    # variant sources must be real bench entries; targets real catalog
    bad_src = sorted(k for k in variants if k not in bq)
    bad_tgt = sorted(v for v in variants.values() if v not in _REGISTRY)
    assert not bad_src, f"variant rows with dead bench names: {bad_src}"
    assert not bad_tgt, f"variant rows with dead catalog names: {bad_tgt}"
    # reasons must be substantive
    thin = sorted(k for k, v in nb.items() if len(v) < 20)
    assert not thin, f"NOT_BENCHED reasons too thin: {thin}"


def test_committed_manifest_matches_regeneration():
    from spark_tsne_spark.plans.bench_manifest import render

    path = os.path.join(REPO, "BENCH_MANIFEST.md")
    assert os.path.exists(path), "BENCH_MANIFEST.md not committed"
    with open(path) as f:
        committed = f.read()
    assert committed == render(), (
        "BENCH_MANIFEST.md is stale — regenerate with "
        "`python -m spark_tsne_spark.plans.bench_manifest > BENCH_MANIFEST.md`"
    )
