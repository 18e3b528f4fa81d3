"""Whole-path megakernel (render/fused.py) vs the XLA-side integrator.

Both consume the :func:`prepare_uniforms` channel contract with the same key
schedule, so at matched RNG they trace the same stochastic paths; residual
differences are f32 associativity, which can occasionally flip a discrete
branch pick on a knife-edge ray.  The test demands exact agreement for the
overwhelming majority of rays and close means overall.

A small synthetic scene is used instead of bounce.txt because interpret-mode
cost scales with (table rows × bounces): emissive quad light, diffuse floor
quad, glass sphere (Fresnel/TIR path), mirror sphere, and a two-sided plane
cover every branch of the bounce loop at a fraction of the op count.
"""

import pytest
import jax
import numpy as np

from raytracercore_tpu.render import camera as cam_mod
from raytracercore_tpu.render.fused import fits, trace_fused
from raytracercore_tpu.render.integrator import trace
from raytracercore_tpu.scene import loader
from raytracercore_tpu.scene.types import freeze_scene, init_camera

SCENE = """
size 16 16
recursion 4
ambient color 0.05 0.05 0.05
camera 0 1 4  0 1 0  0 1 0  60
emission 6 6 6
vertex -1 2.5 -1
vertex 1 2.5 -1
vertex -1 2.5 1
tri 0 1 2 mirrored
emission 0 0 0
diffuse .7 .6 .5
twosided true
plane -1  0 0 1
diffuse 0 0 0
specular .9 .9 .9
shininess 100000
refraction .9 .9 .9, 1.52
sphere -0.8 1 0.5 0.6
refraction off
shininess 1000000
sphere 0.8 1 0.5 0.6
"""


def _trace_both(scene_text, seed):
    scene = loader.parse(scene_text)
    arrays = freeze_scene(scene)
    assert fits(arrays)
    cam = init_camera(scene.cameras[0], scene.width, scene.height)
    px, py = cam_mod.pixel_grid(scene.width, scene.height)
    k_cam, k_path = jax.random.split(jax.random.PRNGKey(seed))
    ray_o, ray_d = cam_mod.camera_rays(cam, px, py, k_cam)
    ref = trace(arrays, ray_o, ray_d, k_path)
    got = trace_fused(arrays, ray_o, ray_d, k_path, interpret=True)
    return ref, got


@pytest.mark.slow
def test_trace_fused_matches_integrator():
    (ref_color, ref_miss), (got_color, got_miss) = _trace_both(SCENE, 7)

    ref_c = np.asarray(ref_color)
    got_c = np.asarray(got_color)
    # The scene must actually light up (guard against all-black vacuous
    # agreement).
    assert ref_c.max() > 0.5
    # Same stochastic paths ⇒ same miss classification everywhere.
    np.testing.assert_array_equal(np.asarray(got_miss), np.asarray(ref_miss))
    close = np.all(np.abs(ref_c - got_c) <= 1e-3 + 1e-3 * np.abs(ref_c),
                   axis=1)
    # 0.97 over 256 rays: f32 associativity differences between backends
    # (real-TPU Mosaic vs interpret/XLA) can flip stochastic branch picks on
    # knife-edge rays, so allow a few whole-path divergences.
    assert close.mean() > 0.97, f"only {close.mean():.3f} of rays match"
    np.testing.assert_allclose(got_c.mean(0), ref_c.mean(0), rtol=5e-3,
                               atol=5e-3)


@pytest.mark.slow
def test_trace_fused_ambient_miss_mode():
    # `ambient miss`: secondary misses count as miss samples.
    text = SCENE.replace("ambient color 0.05 0.05 0.05", "ambient miss")
    (ref_color, ref_miss), (got_color, got_miss) = _trace_both(text, 11)
    np.testing.assert_array_equal(np.asarray(got_miss), np.asarray(ref_miss))
    ref_c = np.asarray(ref_color)
    got_c = np.asarray(got_color)
    close = np.all(np.abs(ref_c - got_c) <= 1e-3 + 1e-3 * np.abs(ref_c),
                   axis=1)
    assert close.mean() > 0.97, f"only {close.mean():.3f} of rays match"


@pytest.mark.slow
def test_kernel_tape_matches_trace_tape():
    """``want_tape=True``: the megakernel-recorded PathTape agrees with the
    integrator's own tape (codes everywhere; prim + full flags wherever the
    replay reads them), and the [R]-shaped replay re-walks the kernel's
    path to the exact colors the kernel produced — the contract the fast
    train recording path (replay.record_tape_fused) relies on."""
    import jax.numpy as jnp

    from raytracercore_tpu.render.integrator import PathTape, prepare_uniforms
    from raytracercore_tpu.render.replay import replay

    scene = loader.parse(SCENE)
    arrays = freeze_scene(scene)
    cam = init_camera(scene.cameras[0], scene.width, scene.height)
    px, py = cam_mod.pixel_grid(scene.width, scene.height)
    k_cam, k_path = jax.random.split(jax.random.PRNGKey(3))
    ray_o, ray_d = cam_mod.camera_rays(cam, px, py, k_cam)
    uniforms = prepare_uniforms(k_path, ray_o.shape[0],
                                arrays.recursion + 1, jnp.float32)

    _, m_ref, tape_ref = trace(arrays, ray_o, ray_d, None,
                               uniforms=uniforms, want_tape=True)
    c_k, m_k, tape_k = trace_fused(arrays, ray_o, ray_d, None,
                                   uniforms=uniforms, want_tape=True,
                                   interpret=True)

    code_ref = np.asarray(tape_ref.flags & PathTape.CODE_MASK)
    code_k = np.asarray(tape_k.flags & PathTape.CODE_MASK)
    # Codes must agree near-universally; knife-edge f32 branch flips between
    # backends are the only allowed source of disagreement (see
    # test_trace_fused_matches_integrator).
    agree = code_ref == code_k
    assert agree.mean() > 0.99, f"only {agree.mean():.3f} of codes match"
    nonskip = agree & (code_ref != 0)
    assert nonskip.any()
    np.testing.assert_array_equal(np.asarray(tape_ref.prim)[nonskip],
                                  np.asarray(tape_k.prim)[nonskip])
    # Full flag words (inside/Fresnel-live bits) where the replay reads
    # them: bounced codes (Diffuse=1, Specular=2, Transmitted=4).
    bounced = agree & np.isin(code_ref, (1, 2, 4))
    assert bounced.any()
    np.testing.assert_array_equal(np.asarray(tape_ref.flags)[bounced],
                                  np.asarray(tape_k.flags)[bounced])

    # The replay of the kernel's tape must land on the kernel's own colors
    # (exactly, when every code agrees — both walk the same decisions).
    c_rep, m_rep = replay(arrays, ray_o, ray_d, uniforms, tape_k)
    if agree.all():
        np.testing.assert_allclose(np.asarray(c_rep), np.asarray(c_k),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m_rep), np.asarray(m_k))
    else:  # pragma: no cover - backend-dependent knife edges
        both = np.all(agree, axis=0)
        np.testing.assert_allclose(np.asarray(c_rep)[both],
                                   np.asarray(c_k)[both],
                                   rtol=1e-5, atol=1e-5)
