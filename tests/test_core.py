import jax.numpy as jnp
import numpy as np

from gapro_tpu.core import bucketing, segment
from gapro_tpu.core.packing import (
    KEY_MAX,
    pack_coords,
    pair_lexsort,
    pair_lookup,
    pair_searchsorted,
)


def test_next_bucket():
    assert bucketing.next_bucket(1) == 128
    assert bucketing.next_bucket(128) == 128
    assert bucketing.next_bucket(129) == 192
    assert bucketing.next_bucket(193) == 256
    assert bucketing.next_bucket(260) == 384
    assert bucketing.next_bucket(1000, granularity=1) == 1024
    for n in [7, 100, 999, 12345, 250000]:
        assert bucketing.next_bucket(n) >= n


def test_pad_axis():
    x = np.arange(6).reshape(3, 2)
    y = bucketing.pad_axis(x, 5, axis=0, fill=-1)
    assert y.shape == (5, 2)
    assert (y[3:] == -1).all()
    assert (y[:3] == x).all()


def test_segment_ops_against_numpy():
    rng = np.random.default_rng(0)
    n, k = 300, 17
    data = rng.normal(size=(n, 4)).astype(np.float32)
    seg = rng.integers(-1, k, size=n)  # includes invalid -1
    num_segments = k

    got_sum = np.asarray(segment.segment_sum(jnp.asarray(data), jnp.asarray(seg), num_segments))
    got_mean = np.asarray(segment.segment_mean(jnp.asarray(data), jnp.asarray(seg), num_segments))
    got_min = np.asarray(
        segment.segment_min(jnp.asarray(data[:, 0]), jnp.asarray(seg), num_segments)
    )
    got_max = np.asarray(
        segment.segment_max(jnp.asarray(data[:, 0]), jnp.asarray(seg), num_segments)
    )

    for s in range(k):
        m = seg == s
        if m.sum() == 0:
            assert np.allclose(got_sum[s], 0)
            continue
        np.testing.assert_allclose(got_sum[s], data[m].sum(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_mean[s], data[m].mean(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_min[s], data[m, 0].min(), rtol=1e-6)
        np.testing.assert_allclose(got_max[s], data[m, 0].max(), rtol=1e-6)


def test_segment_argmin():
    data = jnp.asarray([5.0, 1.0, 3.0, 1.0, 9.0, 2.0])
    seg = jnp.asarray([0, 0, 1, 1, 2, 2])
    arg = np.asarray(segment.segment_argmin(data, seg, 3))
    assert arg[0] == 1
    assert arg[1] == 3  # value 1.0 at index 3
    assert arg[2] == 5


def test_compact_unique():
    ids = jnp.asarray([30, 10, 10, 20, 30, 99])
    valid = jnp.asarray([True, True, True, True, True, False])
    uniq, inverse, count = segment.compact_unique(ids, 8, valid=valid)
    uniq, inverse, count = np.asarray(uniq), np.asarray(inverse), int(count)
    assert count == 3
    assert list(uniq[:3]) == [10, 20, 30]
    assert list(inverse) == [2, 0, 0, 1, 2, -1]


def test_pair_search_and_lookup():
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 40, size=(200, 4)).astype(np.int32)
    coords[:, 0] = rng.integers(0, 3, size=200)
    extents = (64, 64, 64)
    hi, lo = pack_coords(jnp.asarray(coords), extents)
    order = pair_lexsort(hi, lo)
    shi, slo = hi[order], lo[order]

    # membership queries: all originals must be found
    idx, found = pair_lookup(shi, slo, hi, lo)
    assert bool(found.all())
    np.testing.assert_array_equal(np.asarray(shi)[np.asarray(idx)], np.asarray(hi))

    # a key guaranteed absent
    q_hi = jnp.asarray([10_000_000], dtype=jnp.int32)
    q_lo = jnp.asarray([0], dtype=jnp.int32)
    idx2, found2 = pair_lookup(shi, slo, q_hi, q_lo)
    assert not bool(found2[0])
    assert int(idx2[0]) == -1

    # searchsorted against numpy oracle on merged scalar keys
    merged = np.asarray(shi).astype(np.int64) * (1 << 31) + np.asarray(slo)
    q = rng.integers(0, 3, size=(50, 4)).astype(np.int32)
    qh, ql = pack_coords(jnp.asarray(q), extents)
    got = np.asarray(pair_searchsorted(shi, slo, qh, ql))
    want = np.searchsorted(merged, np.asarray(qh).astype(np.int64) * (1 << 31) + np.asarray(ql))
    np.testing.assert_array_equal(got, want)

    # sentinel handling
    assert KEY_MAX == np.iinfo(np.int32).max


def test_point_batch_pack_roundtrip():
    """One-buffer upload must reproduce every PointBatch field exactly
    (ints < 2^24 and the -100 sentinels are exact in f32)."""
    import numpy as np

    from gapro_tpu.data.synthetic import make_synthetic_scene
    from gapro_tpu.models.prepare import (pack_point_batch_np,
                                          points_to_batch_np,
                                          unpack_point_batch)

    sc = make_synthetic_scene(seed=0)
    pb = points_to_batch_np([dict(xyz=sc.xyz, rgb=sc.rgb, sem=sc.semantic_label,
                                  inst=sc.instance_label, spp=sc.spp)],
                            voxel_scale=50)
    up = unpack_point_batch(jnp.asarray(pack_point_batch_np(pb)))
    for name in pb._fields:
        a, b = np.asarray(getattr(pb, name)), np.asarray(getattr(up, name))
        np.testing.assert_array_equal(a.astype(b.dtype), b, err_msg=name)
