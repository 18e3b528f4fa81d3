"""Integrator tests: termination semantics, energy behavior, simple
radiometric sanity checks, and a smoke render of the Cornell box."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracercore_tpu.render import Renderer, trace
from raytracercore_tpu.render.renderer import render_pass
from raytracercore_tpu.scene import loader
from raytracercore_tpu.scene.types import (HostScene, HostSphere,
                                           HostTriangle, freeze_scene)

jit_trace = jax.jit(trace)


def single_quad_scene(emission=None, diffuse=None, recursion=3, **mat):
    scene = HostScene(width=4, height=4, recursion=recursion)
    quad = HostTriangle(v0=np.array([-5.0, -5, 0]),
                        v1=np.array([5.0, -5, 0]),
                        v2=np.array([-5.0, 5, 0]), mirror=True)
    m = quad.material
    m.two_sided = True
    if emission is not None:
        m.emission = np.asarray(emission, float)
    if diffuse is not None:
        m.diffuse = np.asarray(diffuse, float)
    for k, v in mat.items():
        setattr(m, k, v)
    scene.add_primitive(quad)
    return scene, quad


def rays_toward_quad(n=64):
    o = jnp.tile(jnp.array([[0.0, 0, -3.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0, 1.0]], jnp.float32), (n, 1))
    return o, d


def test_pure_emitter_returns_emission():
    scene, _ = single_quad_scene(emission=[2.0, 1.0, 0.5])
    arr = freeze_scene(scene)
    o, d = rays_toward_quad()
    color, miss = jit_trace(arr, o, d, jax.random.PRNGKey(0))
    # Only the emission branch is available (all other lums are 0) ⇒ every
    # sample terminates with tint(=1)·emission.
    np.testing.assert_allclose(np.asarray(color),
                               np.tile([2.0, 1.0, 0.5], (64, 1)), atol=1e-5)
    assert not np.asarray(miss).any()


def test_primary_miss_is_miss_sample():
    scene, _ = single_quad_scene(emission=[1.0, 1, 1])
    arr = freeze_scene(scene)
    o = jnp.array([[0.0, 0, -3.0]], jnp.float32)
    d = jnp.array([[0.0, 0, -1.0]], jnp.float32)  # away from quad
    color, miss = jit_trace(arr, o, d, jax.random.PRNGKey(0))
    assert bool(miss[0])
    np.testing.assert_allclose(np.asarray(color[0]), 0.0)


def test_secondary_miss_returns_ambient_untinted():
    # Diffuse-only quad, ambient color set: a bounce ray that misses must
    # return the raw ambient color, NOT tint*ambient (Raytracer.cs:90).
    scene, _ = single_quad_scene(diffuse=[0.5, 0.5, 0.5], recursion=2)
    scene.ambient_rgb = np.array([0.3, 0.2, 0.1])
    arr = freeze_scene(scene)
    o, d = rays_toward_quad(256)
    color, miss = jit_trace(arr, o, d, jax.random.PRNGKey(1))
    col = np.asarray(color)
    # The quad's luminance is 0.5 < 1 ⇒ energy compensation max(totalLum,1)
    # leaves tint = diffuse = 0.5 after the first bounce.  Bounce rays all
    # miss (nothing else in the scene) ⇒ every non-emission path returns the
    # ambient color exactly.
    emitted = (col == 0).all(-1)  # emission-pick paths (emission black)
    returned_ambient = ~emitted
    assert returned_ambient.sum() > 0
    np.testing.assert_allclose(col[returned_ambient],
                               np.tile([0.3, 0.2, 0.1],
                                       (int(returned_ambient.sum()), 1)),
                               atol=1e-5)
    assert not np.asarray(miss).any()


def test_ambient_miss_mode():
    scene, _ = single_quad_scene(diffuse=[0.5, 0.5, 0.5], recursion=2)
    scene.ambient_rgb = None  # `ambient miss`
    arr = freeze_scene(scene)
    o, d = rays_toward_quad(128)
    color, miss = jit_trace(arr, o, d, jax.random.PRNGKey(1))
    # All paths either bounce-and-miss (→ miss sample) or pick emission
    # (black → zero color, not a miss).
    m = np.asarray(miss)
    col = np.asarray(color)
    assert m.sum() > 0
    np.testing.assert_allclose(col[m], 0.0)


def test_recursion_zero_returns_first_emission():
    scene, _ = single_quad_scene(emission=[1.0, 2, 3],
                                 diffuse=[0.9, 0.9, 0.9], recursion=0)
    arr = freeze_scene(scene)
    o, d = rays_toward_quad(8)
    color, _ = jit_trace(arr, o, d, jax.random.PRNGKey(0))
    # recursion=0 ⇒ loop runs once, immediately RecursionComplete ⇒
    # tint(=1)·emission, no RNG consumed.
    np.testing.assert_allclose(np.asarray(color),
                               np.tile([1.0, 2, 3], (8, 1)), atol=1e-5)


def test_mirror_reflection_chain():
    # Two parallel mirrors facing a light: ray bounces specularly then hits
    # the emitter.  shininess=inf ⇒ deterministic reflection.
    scene = HostScene(width=4, height=4, recursion=4)
    mirror = HostTriangle(v0=np.array([-5.0, -5, 0]),
                          v1=np.array([5.0, -5, 0]),
                          v2=np.array([-5.0, 5, 0]), mirror=True)
    mirror.material.two_sided = True
    mirror.material.specular = np.array([0.8, 0.8, 0.8])
    mirror.material.shininess = np.inf
    light = HostSphere(center=np.array([0.0, 0, -4.0]), radius=1.0)
    light.material.two_sided = True
    light.material.emission = np.array([5.0, 5, 5])
    scene.add_primitive(mirror)
    scene.add_primitive(light)
    arr = freeze_scene(scene)
    # Ray between light and mirror heading at the mirror: hits the quad at
    # z=0 (backface, normal flipped to -z), reflects deterministically to
    # -z, hits the sphere front at z=-3, picks emission (only branch).
    # Throughput: spec tint 0.8 · max(totalLum=0.8, 1)=1 ⇒ color 0.8·5 = 4.
    o = jnp.array([[0.0, 0.0, -1.5]], jnp.float32)
    d = jnp.array([[0.0, 0, 1.0]], jnp.float32)
    color, _ = jit_trace(arr, o, d, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(color[0]), [4.0, 4, 4], atol=1e-3)


def test_render_pass_and_renderer_smoke(bounce_txt):
    scene = loader.parse(bounce_txt)
    scene.width = scene.height = 32  # small smoke render
    r = Renderer(scene, camera_index=0, seed=7)
    r.step(4)
    st = r.status()
    assert st["samples_per_px"] == 4
    img = r.image(exposure=1.0)
    assert img.shape == (32, 32, 4)
    # Light box pixels should be bright somewhere; image must not be all
    # black or contain NaNs upstream (uint8 conversion would hide them, so
    # check the film too).
    film_np = np.asarray(r.film.color_sum)
    assert np.isfinite(film_np).all()
    assert img[..., :3].max() > 100
    # Camera 0 sits OUTSIDE the room; rays through the single-sided
    # inverted walls hit the interior, the rest miss to background —
    # both populations must exist.
    misses = np.asarray(r.film.misses)
    samples = np.asarray(r.film.samples)
    assert misses.sum() > 0 and samples.sum() > 0
    np.testing.assert_array_equal(misses + samples, 4.0)


def test_checkpoint_roundtrip(tmp_path, bounce_txt):
    scene = loader.parse(bounce_txt)
    scene.width = scene.height = 16
    r = Renderer(scene, seed=3)
    r.step(2)
    path = tmp_path / "ckpt.npz"
    r.save_checkpoint(str(path))
    img_before = r.image()

    r2 = Renderer(scene, seed=3)
    r2.load_checkpoint(str(path))
    assert r2.pass_index == 2
    np.testing.assert_array_equal(img_before, r2.image())
    # Continue rendering after resume.
    r2.step(1)
    assert r2.pass_index == 3


def test_early_exit_matches_fori(bounce_txt):
    """The while_loop early-exit path must produce bitwise-identical colors
    to the fixed-trip fori path."""
    from raytracercore_tpu.scene.types import freeze_scene, init_camera
    from raytracercore_tpu.render import camera as cm

    scene = loader.parse(bounce_txt)
    scene.width = scene.height = 16
    scene.recursion = 6
    arrays = freeze_scene(scene)
    cam = init_camera(scene.cameras[0], 16, 16)
    px, py = cm.pixel_grid(16, 16)
    key = jax.random.PRNGKey(21)
    kc, kp = jax.random.split(key)
    o, d = cm.camera_rays(cam, px, py, kc)

    c1, m1 = jax.jit(lambda a, o, d, k: trace(a, o, d, k))(arrays, o, d, kp)
    c2, m2 = jax.jit(
        lambda a, o, d, k: trace(a, o, d, k, early_exit=True))(
            arrays, o, d, kp)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
