"""Property-based fuzz: arbitrary op interleavings must fold to the
sequential oracle's state (hypothesis shrinks failures to a minimal op
list — stronger than the fixed-seed fuzz suites).

Bounded deliberately: a handful of docs, ≤40 ops, ≤12 examples per
mode, one shared SparkSession — the whole module stays in CI-scale
time while exploring orders of magnitude more interleavings across
runs than fixed seeds."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scylla_cdc_rust_spark.datagen.oracle import oracle_replay
from scylla_cdc_rust_spark.functions.decode import decode
from scylla_cdc_rust_spark.operators.fold import fold
from tests.scenarios import LogBuilder
from tests.util import spark_df_from_arrow

DOCS = ["a", "b", "c"]
ELEMS = st.lists(st.integers(0, 9), min_size=0, max_size=4)

OP = st.one_of(
    st.tuples(st.just("insert"), st.sampled_from(DOCS), ELEMS),
    st.tuples(st.just("add"), st.sampled_from(DOCS), ELEMS),
    st.tuples(st.just("remove"), st.sampled_from(DOCS), ELEMS),
    st.tuples(st.just("overwrite"), st.sampled_from(DOCS), ELEMS),
    st.tuples(st.just("update_ntok"), st.sampled_from(DOCS),
              st.integers(0, 99)),
    st.tuples(st.just("del_col"), st.sampled_from(DOCS), st.just(None)),
    st.tuples(st.just("del_row"), st.sampled_from(DOCS), st.just(None)),
    st.tuples(st.just("del_part"), st.sampled_from(DOCS), st.just(None)),
)


def build_log(ops):
    b = LogBuilder()
    for kind, doc, arg in ops:
        if kind == "insert":
            b.insert(doc, arg)
        elif kind == "add":
            b.add_tokens(doc, arg)
        elif kind == "remove":
            b.remove_tokens(doc, arg)
        elif kind == "overwrite":
            b.overwrite_tokens(doc, arg)
        elif kind == "update_ntok":
            b.update(doc, n_tok=arg)
        elif kind == "del_col":
            b.delete_col(doc, "tokens")
        elif kind == "del_row":
            b.delete_row(doc)
        elif kind == "del_part":
            b.delete_partition(doc)
    return b.build()


def norm(rows):
    return {
        r["doc_id"]: (
            sorted(r["tokens"]) if r["tokens"] is not None else None,
            r["n_tok"], r["source"],
        )
        for r in rows
    }


@pytest.mark.parametrize("set_impl", ["elements", "arrays"])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(OP, min_size=1, max_size=40))
def test_fold_matches_oracle_on_arbitrary_interleavings(spark, set_impl, ops):
    tbl = build_log(ops)
    got = norm(
        fold(
            decode(spark_df_from_arrow(spark, tbl)),
            collection_modes={"tokens": "set"},
            set_impl=set_impl,
        ).collect()
    )
    want = {
        k: (
            sorted(v["tokens"]) if v["tokens"] is not None else None,
            v["n_tok"], v["source"],
        )
        for k, v in oracle_replay(tbl, collection_modes={"tokens": "set"}).items()
    }
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_image_codec_roundtrip_property(w, h, seed):
    """Any (h, w, 3) uint8 image survives PPM and BMP encode→decode
    bit-for-bit (row padding, bottom-up order, BGR swap all on the
    hook); nearest_resize output dims always match the request."""
    import numpy as np

    from scylla_cdc_rust_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        nearest_resize,
    )

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)
    rw, rh = max(1, w // 2), max(1, h // 3)
    assert nearest_resize(px, rw, rh).shape == (rh, rw, 3)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 500),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_codec_roundtrip_property(n, rate, seed):
    import numpy as np

    from scylla_cdc_rust_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int64
    ).astype(np.int16)
    dec, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate and dec.shape == (n, 1)
    np.testing.assert_array_equal(dec[:, 0], s)
