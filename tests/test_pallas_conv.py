"""Pallas subm-conv kernel vs the XLA formulation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from gapro_tpu.sparse.conv import subm_conv
from gapro_tpu.sparse.pallas_conv import subm_conv_pallas


def test_pallas_subm_conv_matches_xla():
    rng = np.random.default_rng(0)
    v, cin, cout = 100, 8, 16
    cap = 128
    feats = np.zeros((cap, cin), np.float32)
    feats[:v] = rng.normal(size=(v, cin))
    nbr = np.full((cap, 27), -1, np.int32)
    for i in range(v):
        picks = rng.choice(v, size=9, replace=False)
        slots = rng.choice(27, size=9, replace=False)
        nbr[i, slots] = picks
    nbr[:, 13] = np.where(np.arange(cap) < v, np.arange(cap), -1)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    valid = np.arange(cap) < v

    want = np.asarray(subm_conv(jnp.asarray(feats), jnp.asarray(nbr),
                                jnp.asarray(w), jnp.asarray(valid)))
    got = np.asarray(subm_conv_pallas(jnp.asarray(feats), jnp.asarray(nbr),
                                      jnp.asarray(w), jnp.asarray(valid),
                                      tile=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert (got[v:] == 0).all()
