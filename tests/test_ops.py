import numpy as np
import jax
import jax.numpy as jnp

from posegen_tpu.ops import embedding as E
from posegen_tpu.ops import encoders as enc
from posegen_tpu.ops import sampling as S
from posegen_tpu.skeleton import kinematics as K
from posegen_tpu.skeleton.geometry import get_kp_bounding_cylinder
from posegen_tpu.skeleton.skeleton import SMPL_SKELETON


def test_plain_embedder_layout(rng):
    cfg = E.EmbedConfig(num_freqs=2, input_dims=3, include_input=True)
    x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    out, w = E.embed(cfg, x)
    assert w is None
    assert out.shape == (5, cfg.out_dim) and cfg.out_dim == 3 + 2 * 2 * 3
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(x))
    np.testing.assert_allclose(np.asarray(out[:, 3:6]), np.sin(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 6:9]), np.cos(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 9:12]), np.sin(2 * np.asarray(x)), atol=1e-6)


def test_cutoff_embedder_gates(rng):
    NJ, NF = 24, 7
    cfg = E.EmbedConfig(
        num_freqs=NF, input_dims=NJ, cutoff=True, cutoff_dim=NJ,
        cutoff_inputs=True, include_input=True,
    )
    state = E.init_embed_state(cfg, cutoff_dist=jnp.full((NJ,), 0.5))
    # distances far beyond cutoff -> everything gated to ~0 at high tau
    state["tau"] = jnp.asarray(2000.0)
    d_far = jnp.full((4, 8, NJ), 5.0)
    out, w = E.embed(cfg, d_far, dists=d_far, state=state)
    assert out.shape == (4, 8, cfg.out_dim)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)
    # distances well inside -> gate ~1, identity part preserved
    d_near = jnp.full((4, 8, NJ), 0.01)
    out2, w2 = E.embed(cfg, d_near, dists=d_near, state=state)
    np.testing.assert_allclose(np.asarray(out2[..., :NJ]), 0.01, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2), 1.0, atol=1e-5)


def test_cutoff_embedder_dist_inputs_expand(rng):
    NJ, NF = 24, 4
    cfg = E.EmbedConfig(
        num_freqs=NF, input_dims=NJ * 3, cutoff=True, cutoff_dim=NJ,
        dist_inputs=True, cutoff_inputs=True, include_input=True,
    )
    assert cfg.expand == 3
    state = E.init_embed_state(cfg, cutoff_dist=jnp.full((NJ,), 0.5))
    state["tau"] = jnp.asarray(2000.0)
    x = jnp.asarray(rng.normal(size=(2, 6, NJ * 3)).astype(np.float32))
    # gate out joint 0 only
    dists = jnp.full((2, 6, NJ), 0.01).at[..., 0].set(5.0)
    out, w = E.embed(cfg, x, dists=dists, state=state)
    assert out.shape == (2, 6, cfg.out_dim)
    out = np.asarray(out).reshape(2, 6, 1 + 2 * NF, NJ * 3)
    np.testing.assert_allclose(out[..., 0:3], 0.0, atol=1e-5)  # joint-0 channels off
    assert np.abs(out[..., 3:6]).max() > 0.01  # joint-1 channels alive


def test_tau_alpha_schedules():
    cfg = E.EmbedConfig(num_freqs=7, input_dims=24, cutoff=True, freq_schedule=True)
    t0 = E.update_tau(cfg, 0, 250, 10.0)
    t1 = E.update_tau(cfg, 250_000, 250, 10.0)
    t_inf = E.update_tau(cfg, 10_000_000, 250, 10.0)
    assert np.isclose(float(t0), 20.0)
    assert np.isclose(float(t1), 200.0, rtol=1e-5)
    assert float(t_inf) == 2000.0
    a = E.update_alpha(cfg, 2500, 5)
    assert np.isclose(float(a), 6.0 * 0.5)


def test_transform_batch_pts_places_joints_at_origin(rng):
    bones = jnp.asarray(rng.normal(size=(3, 24, 3)).astype(np.float32) * 0.3)
    pelvis = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE

    kps, skts, _, _ = K.pose_to_kinematic(bones, pelvis, jnp.asarray(SMPL_REST_POSE))
    # treat keypoints themselves as query points: local coords of joint j wrt j == 0
    pts = kps  # (3, 24, 3) -> N_rays=3, N_samples=24
    pts_t = enc.transform_batch_pts(pts, skts)
    assert pts_t.shape == (3, 24, 24, 3)
    for j in range(24):
        np.testing.assert_allclose(np.asarray(pts_t[:, j, j]), 0.0, atol=1e-4)


def test_reldist_matches_world_distance(rng):
    bones = jnp.asarray(rng.normal(size=(2, 24, 3)).astype(np.float32) * 0.3)
    pelvis = jnp.zeros((2, 3))
    from posegen_tpu.skeleton.skeleton import SMPL_REST_POSE

    kps, skts, _, _ = K.pose_to_kinematic(bones, pelvis, jnp.asarray(SMPL_REST_POSE))
    pts = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    pts_t = enc.transform_batch_pts(pts, skts)
    v_local = enc.reldist_encode(pts, pts_t, kps)
    v_world = enc.reldist_encode(pts, None, kps)
    np.testing.assert_allclose(np.asarray(v_local), np.asarray(v_world), atol=1e-4)


def test_vecnorm_and_rayang_shapes(rng):
    pts_t = jnp.asarray(rng.normal(size=(4, 6, 24, 3)).astype(np.float32))
    rays_t = jnp.asarray(rng.normal(size=(4, 1, 24, 3)).astype(np.float32))
    v = enc.vecnorm_encode(rays_t, refs=pts_t)
    assert v.shape == (4, 6, 72)
    a = enc.rayang_encode(rays_t, pts_t)
    assert a.shape == (4, 6, 24)
    assert np.all(np.abs(np.asarray(a)) <= np.pi / 2 + 1e-5)


def test_stratified_sampling_bounds(rng):
    near = jnp.full((8, 1), 1.0)
    far = jnp.full((8, 1), 3.0)
    z = S.sample_from_lineseg(near, far, 16)
    assert z.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 3.0)
    zp = S.sample_from_lineseg(near, far, 16, perturb=1.0, key=jax.random.PRNGKey(0))
    assert np.all(np.asarray(zp) >= 1.0 - 1e-6) and np.all(np.asarray(zp) <= 3.0 + 1e-6)
    assert np.all(np.diff(np.asarray(zp), axis=-1) > -1e-6)


def test_sample_pdf_concentrates_on_peak(rng):
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 63), (4, 63))
    w = jnp.zeros((4, 62)).at[:, 30].set(100.0)
    samples = S.sample_pdf(bins, w, 32, det=True)
    assert samples.shape == (4, 32)
    mid = bins[0, 30:32].mean()
    assert np.all(np.abs(np.asarray(samples[:, 1:-1]) - float(mid)) < 0.1)


def test_isample_merge_sorted(rng):
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 16), (4, 16))
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=(4, 16)).astype(np.float32))
    z_all, z_s, idx = S.isample_from_lineseg(z, w, 8, det=True)
    assert z_all.shape == (4, 24) and z_s.shape == (4, 8) and idx.shape == (4, 24)
    assert np.all(np.diff(np.asarray(z_all), axis=-1) >= 0)


def test_cylinder_near_far(rng):
    # rays from z=+5 toward origin; person cylinder near origin
    kp = np.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32)) * 0.3
    cyl = get_kp_bounding_cylinder(kp, skel=SMPL_SKELETON, ext_scale=0.001, head="-y")
    N = 16
    rays_o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 5.0]), (N, 3))
    dirs = np.stack(
        [np.linspace(-0.05, 0.05, N), np.zeros(N), -np.ones(N)], axis=-1
    ).astype(np.float32)
    rays_d = jnp.asarray(dirs)
    cyls = jnp.broadcast_to(jnp.asarray(cyl), (N, 5))
    near, far = S.get_near_far_in_cylinder(rays_o, rays_d, cyls, near=0.35, far=10.0)
    assert near.shape == (N, 1) and far.shape == (N, 1)
    assert np.all(np.asarray(far) > np.asarray(near))
    # intersections should bracket the cylinder (z in ~[-r, r] -> t in ~[5-r, 5+r])
    r = cyl[0, 2]
    assert np.all(np.asarray(near) > 5.0 - r - 0.5)
    assert np.all(np.asarray(far) < 5.0 + r + 0.5)
