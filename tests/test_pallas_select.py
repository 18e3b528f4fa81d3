"""Pallas selection kernel vs the jnp selection oracle (interpret mode on
CPU; the compiled path runs on TPU via bench/renders)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from raytracercore_tpu.core import vecmath as vm
from raytracercore_tpu.intersect import closest_hit, pallas_select
from raytracercore_tpu.intersect.dispatch import (HitRecord, _position_eps,
                                                  _plane_select,
                                                  _sphere_select,
                                                  _triangle_select_dense)
from raytracercore_tpu.scene import loader
from raytracercore_tpu.scene.types import freeze_scene


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


@pytest.mark.slow
def test_pallas_matches_jnp_selection(bounce_txt):
    scene = loader.parse(bounce_txt)
    arrays = freeze_scene(scene)
    o, d = _rays(256, 0)
    eps_b = vm.near_enough(jnp.float32)
    eps_p = _position_eps(jnp.float32)

    for skip in (None, HitRecord(
            prim=jnp.asarray(
                np.random.default_rng(1).integers(-1, 22, 256), jnp.int32),
            t=jnp.zeros(256),
            position=o, normal=d,
            inside=jnp.asarray(
                np.random.default_rng(2).integers(0, 2, 256) == 1))):
        (ti, ta), (si, sn, sa), (pi_, pa) = pallas_select.select_all(
            arrays, o, d, skip, eps_b, eps_p, interpret=True)

        rt_ti, rt_ta = _triangle_select_dense(arrays, o, d, skip, eps_b,
                                              eps_p)
        rt_si, rt_sn, rt_sa = _sphere_select(arrays, o, d, skip, eps_p)
        rt_pi, rt_pa = _plane_select(arrays, o, d, skip, eps_b, eps_p)

        np.testing.assert_array_equal(np.asarray(ta), np.asarray(rt_ta))
        m = np.asarray(ta)
        np.testing.assert_array_equal(np.asarray(ti)[m],
                                      np.asarray(rt_ti)[m])
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(rt_sa))
        ms = np.asarray(sa)
        np.testing.assert_array_equal(np.asarray(si)[ms],
                                      np.asarray(rt_si)[ms])
        np.testing.assert_array_equal(np.asarray(sn)[ms],
                                      np.asarray(rt_sn)[ms])
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(rt_pa))


def test_fused_hit_record_matches_dispatch(bounce_txt):
    """closest_hit_fused (in-kernel winner evaluation) vs the dispatch
    pipeline, including skip records."""
    scene = loader.parse(bounce_txt)
    arrays = freeze_scene(scene)
    o, d = _rays(256, 3)

    ref = jax.jit(closest_hit)(arrays, o, d, None)
    got = pallas_select.closest_hit_fused(arrays, o, d, None,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    m = np.asarray(ref.found)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.position)[m],
                               np.asarray(ref.position)[m], atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.normal)[m],
                               np.asarray(ref.normal)[m], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.inside)[m],
                                  np.asarray(ref.inside)[m])

    # Second bounce with the first hit as skip record.
    ref2 = jax.jit(closest_hit)(arrays, o, d, ref)
    got2 = pallas_select.closest_hit_fused(arrays, o, d, ref,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got2.prim),
                                  np.asarray(ref2.prim))
