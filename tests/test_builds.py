"""The bench's artifact-build pass: spec integrity + a cheap end-to-end
slice. The full pass runs in bench.py; here we pin that every builder is
well-formed (a drifted internal signature must fail HERE, not silently
record -1.0 in the bench)."""

from vector_db_from_scratch_spark import builds


def test_build_specs_unique_and_callable():
    specs = builds.build_specs()
    names = [n for n, _ in specs]
    assert len(names) == len(set(names))
    assert all(callable(fn) for _, fn in specs)
    # dependency ordering: primitives strictly before their consumers
    assert names.index("shingle_index") < names.index("jaccard_dfcap_pairs")
    assert names.index("minhash_signatures") < names.index("minhash_lsh_pairs")
    assert names.index("lsh_index_table") < names.index("lsh_persisted_index")


def test_every_builder_succeeds(spark, sf_dir):
    out = builds.run_builds(spark, sf_dir)
    failed = {k: v for k, v in out.items() if v < 0}
    assert not failed, f"builders errored: {failed}"
    assert set(out) == {n for n, _ in builds.build_specs()}
