"""Sampler / loss / LR / EMA tests (reference generate_images.py:43-118,
training_loop.py:47-107, training/phema.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vivid_tpu.diffusion import (NVLoss, SRNVLoss, edm_sampler,
                                 learning_rate_schedule, sigma_schedule,
                                 down_up_resize)
from vivid_tpu.diffusion.phema import (PowerFunctionEMA, exp_to_std,
                                       power_function_beta,
                                       power_function_correlation,
                                       solve_posthoc_coefficients, std_to_exp,
                                       ema_update)
from vivid_tpu.diffusion.loss import clamp_loss


def test_sigma_schedule_values():
    t = sigma_schedule(num_steps=32, sigma_min=0.002, sigma_max=80.0, rho=7.0)
    assert t.shape == (33,)
    np.testing.assert_allclose(t[0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(t[31], 0.002, rtol=1e-4)
    assert t[32] == 0.0
    assert np.all(np.diff(t) < 0)
    # Spot value from the closed form at i=16.
    want = (80 ** (1 / 7) + 16 / 31 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
    np.testing.assert_allclose(t[16], want, rtol=1e-5)


def test_sampler_perfect_denoiser_recovers_target():
    """With an oracle denoiser D(x,t) = x0, Heun integration returns x0."""
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    denoise = lambda x, t: x0
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    out = edm_sampler(denoise, noise, num_steps=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_sampler_linear_denoiser_matches_reference_recursion():
    """Check the Heun update exactly against a step-by-step numpy recursion."""
    rng = np.random.RandomState(0)
    a = 0.3  # D(x, t) = a * x — linear so both integrators are exactly comparable
    denoise = lambda x, t: a * x
    noise = jnp.asarray(rng.randn(1, 4, 4, 1), jnp.float32)
    num_steps = 6
    got = np.asarray(edm_sampler(denoise, noise, num_steps=num_steps))

    t = sigma_schedule(num_steps)
    x = np.asarray(noise) * t[0]
    for i in range(num_steps):
        t_cur, t_next = t[i], t[i + 1]
        d_cur = (x - a * x) / t_cur
        x_next = x + (t_next - t_cur) * d_cur
        if i < num_steps - 1:
            d_prime = (x_next - a * x_next) / t_next
            x_next = x + (t_next - t_cur) * (0.5 * d_cur + 0.5 * d_prime)
        x = x_next
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)


def test_sampler_guidance_lerp():
    """guidance=1 must equal the unguided result; guidance g applies
    ref + g (D - ref)."""
    x0 = jnp.ones((1, 4, 4, 1))
    denoise = lambda x, t: x0
    gnet = lambda x, t: 0.5 * x0
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    base = edm_sampler(denoise, noise, num_steps=4)
    guided1 = edm_sampler(denoise, noise, gnet_denoise=gnet, guidance=1.0, num_steps=4)
    np.testing.assert_allclose(np.asarray(base), np.asarray(guided1), rtol=1e-5)
    # With guidance 2: effective D = ref + 2(D - ref) = 1.5 x0 (both constant).
    guided2 = edm_sampler(denoise, noise, gnet_denoise=gnet, guidance=2.0, num_steps=4)
    want = edm_sampler(lambda x, t: 1.5 * x0, noise, num_steps=4)
    np.testing.assert_allclose(np.asarray(guided2), np.asarray(want), rtol=1e-5)


def test_sampler_churn_changes_trajectory_deterministically():
    denoise = lambda x, t: 0.1 * x
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1))
    a = edm_sampler(denoise, noise, num_steps=4, S_churn=10, rng=jax.random.PRNGKey(7))
    b = edm_sampler(denoise, noise, num_steps=4, S_churn=10, rng=jax.random.PRNGKey(7))
    c = edm_sampler(denoise, noise, num_steps=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_sampler_churn_per_seed_batch_invariance():
    """With per-sample `seeds`, S_churn>0 output for sample i must depend
    only on seeds[i] — not on batch composition or row position
    (StackedRandomGenerator contract, generate_images.py:78-84,120-134)."""
    from vivid_tpu.core.rngs import seeded_normal
    denoise = lambda x, t: 0.1 * x
    kw = dict(num_steps=4, S_churn=10, rng=jax.random.PRNGKey(7))
    # Batch A: seeds [3, 5, 11]; Batch B: seeds [11] alone.
    noise_a = seeded_normal([3, 5, 11], (4, 4, 1))
    noise_b = seeded_normal([11], (4, 4, 1))
    out_a = np.asarray(edm_sampler(denoise, noise_a,
                                   seeds=jnp.asarray([3, 5, 11]), **kw))
    out_b = np.asarray(edm_sampler(denoise, noise_b,
                                   seeds=jnp.asarray([11]), **kw))
    np.testing.assert_allclose(out_a[2], out_b[0], rtol=1e-6)
    # And distinct seeds give distinct churn noise.
    assert not np.allclose(out_a[0], out_a[1])


def test_sampler_jits():
    denoise = lambda x, t: 0.2 * x
    f = jax.jit(lambda n: edm_sampler(denoise, n, num_steps=4))
    out = f(jnp.ones((1, 4, 4, 1)))
    assert out.shape == (1, 4, 4, 1)


def test_lr_schedule_values():
    # Before rampup completes: linear in nimg.
    lr0 = float(learning_rate_schedule(0, 1024, ref_lr=0.012, ref_batches=35000))
    assert lr0 == 0.0
    lr_half = float(learning_rate_schedule(5_000_000, 1024, ref_lr=0.012,
                                           ref_batches=1e12))
    np.testing.assert_allclose(lr_half, 0.012 * 0.5, rtol=1e-5)
    # Deep into decay: inverse sqrt.
    nimg = 35000 * 1024 * 4  # 4x the reference point
    lr = float(learning_rate_schedule(nimg, 1024, ref_lr=0.012, ref_batches=35000,
                                      rampup_Mimg=10))
    np.testing.assert_allclose(lr, 0.012 / 2, rtol=1e-5)


def test_loss_weight_and_shapes():
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=16, num_sources=2, use_bf16=False,
                        model_channels=16, channel_mult=(1, 2), num_blocks=1,
                        attn_resolutions=(8,), channels_per_head=8)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    loss_fn = NVLoss(P_mean=-0.8, P_std=1.6)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3)) * 0.5
    geo = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 20))
    loss = loss_fn(params, cfg, jax.random.PRNGKey(4), src, tgt, geo)
    assert loss.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(loss)))
    mse = NVLoss(P_mean=-0.8, P_std=1.6, plain_mse=True)(
        params, cfg, jax.random.PRNGKey(4), src, tgt, geo)
    assert mse.shape == ()


def test_sr_loss_shapes():
    from vivid_tpu.nn.precond import PrecondConfig, precond_init
    cfg = PrecondConfig(img_resolution=16, num_sources=2, super_res=True,
                        use_bf16=False, model_channels=16, channel_mult=(1, 2),
                        num_blocks=1, attn_resolutions=(8,), channels_per_head=8)
    params = precond_init(jax.random.PRNGKey(0), cfg)
    loss_fn = SRNVLoss(P_mean=-0.8, P_std=1.6)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    geo = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 20))
    loss = loss_fn(params, cfg, jax.random.PRNGKey(4), src, tgt, geo)
    assert loss.shape == (2, 16, 16, 3)


def test_down_up_resize_preserves_constants():
    """Per-row-normalized resampling weights pass constant images through
    exactly (the DC invariant of the torchvision kernel; the global mean of
    a non-constant image is NOT preserved — edge-clamped taps re-weight the
    boundary, identically to torch)."""
    x = jnp.full((1, 16, 16, 3), 0.73, jnp.float32)
    y = down_up_resize(x, 4)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_clamp_loss():
    loss = jnp.concatenate([jnp.zeros(999), jnp.asarray([1000.0])])
    clamped = clamp_loss(loss)
    assert float(clamped.max()) < 1000.0
    assert float(clamped.min()) >= float(loss.mean() - 3 * loss.std()) - 1e-4


def test_phema_std_exp_round_trip():
    for std in [0.05, 0.1, 0.2]:
        np.testing.assert_allclose(exp_to_std(std_to_exp(std)), std, rtol=1e-10)


def test_phema_beta_formula():
    beta = power_function_beta(0.05, t_next=1000.0, t_delta=10.0)
    want = (1 - 10 / 1000) ** (std_to_exp(0.05) + 1)
    np.testing.assert_allclose(beta, want, rtol=1e-12)


def test_phema_correlation_symmetry():
    c1 = power_function_correlation(np.float64(100), np.float64(0.05),
                                    np.float64(200), np.float64(0.1))
    c2 = power_function_correlation(np.float64(200), np.float64(0.1),
                                    np.float64(100), np.float64(0.05))
    np.testing.assert_allclose(c1, c2, rtol=1e-12)


def test_posthoc_coefficients_sum_to_one():
    X = solve_posthoc_coefficients(np.array([100.0, 100.0]),
                                   np.array([0.05, 0.10]),
                                   np.array([100.0]), np.array([0.075]))
    np.testing.assert_allclose(X.sum(axis=0), np.ones(1), rtol=1e-10)


def test_posthoc_identity_reconstruction():
    # Reconstructing a tracked profile from itself gives coefficient 1.
    X = solve_posthoc_coefficients(np.array([100.0, 100.0]),
                                   np.array([0.05, 0.10]),
                                   np.array([100.0]), np.array([0.05]))
    np.testing.assert_allclose(X[:, 0], np.array([1.0, 0.0]), atol=1e-8)


def test_reconstruct_phema_matches_online_tracking():
    """Post-hoc reconstruction of an UNTRACKED std (0.075) from the two
    tracked series must match an exact online EMA tracked at that std
    (EDM2 Algorithm 3 end-to-end)."""
    from vivid_tpu.diffusion.phema import reconstruct_phema
    rng = np.random.RandomState(0)
    stds = [0.05, 0.075, 0.10]        # 0.075 tracked only as ground truth
    params = {"w": jnp.zeros(8)}
    emas = [params] * 3
    snapshots = []
    batch = 64.0
    for step in range(1, 401):
        params = {"w": params["w"] + jnp.asarray(rng.randn(8), jnp.float32) * 0.1}
        emas = ema_update(emas, params, cur_nimg=step * batch,
                          batch_size=batch, stds=stds)
        if step % 20 == 0:
            nimg = int(step * batch)
            snapshots.append((nimg, 0.05, emas[0]))
            snapshots.append((nimg, 0.10, emas[2]))
    rec = reconstruct_phema(snapshots, 0.075, verbose=False)[0]
    want = np.asarray(emas[1]["w"])
    got = np.asarray(rec.params["w"])
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-2 * np.abs(want).max())


def test_reconstruct_phema_identity_from_files(tmp_path):
    """Reconstructing a TRACKED std at the latest snapshot point returns that
    snapshot (identity coefficients), through the file + CLI surface."""
    from click.testing import CliRunner
    from vivid_tpu.cli.reconstruct_phema import main as cli_main
    from vivid_tpu.train.snapshots import load_snapshot, save_snapshot
    from vivid_tpu.nn.precond import PrecondConfig
    cfg = PrecondConfig(img_resolution=32, num_sources=2, model_channels=16,
                        channel_mult=(1, 2), num_blocks=1,
                        attn_resolutions=(16,), channels_per_head=8,
                        use_bf16=False)
    rng = np.random.RandomState(1)
    run = tmp_path / "run"
    run.mkdir()
    last = None
    for kimg in (10, 20, 30):
        for std in (0.05, 0.10):
            tree = {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)}
            save_snapshot(str(run / f"network-snapshot-{kimg:07d}-{std:.3f}.pkl"),
                          tree, cfg)
            if kimg == 30 and std == 0.05:
                last = np.asarray(tree["w"])
    res = CliRunner().invoke(cli_main, ["--in-dir", str(run),
                                        "--out-dir", str(tmp_path / "out"),
                                        "--out-std", "0.050"])
    assert res.exit_code == 0, res.output
    rec = load_snapshot(str(tmp_path / "out" / "phema-0000030-0.050.pkl"))
    # fp16 snapshot storage bounds the round-trip error.
    np.testing.assert_allclose(np.asarray(rec.params["w"]), last,
                               rtol=0, atol=2e-3 * np.abs(last).max())
    assert rec.cfg.model_channels == 16


def test_ema_update_converges_to_params():
    params = {"w": jnp.ones((4,))}
    emas = [{"w": jnp.zeros((4,))}]
    for step in range(1, 2000):
        emas = ema_update(emas, params, cur_nimg=step * 64.0, batch_size=64.0,
                          stds=[0.05])
    assert float(jnp.abs(emas[0]["w"] - 1.0).max()) < 0.05


def test_power_ema_wrapper_suffixes():
    ema = PowerFunctionEMA({"w": jnp.zeros(3)})
    pairs = ema.get()
    assert [s for _, s in pairs] == ["-0.050", "-0.100"]
    state = ema.state_dict()
    ema2 = PowerFunctionEMA({"w": jnp.ones(3)})
    ema2.load_state_dict(state)
    np.testing.assert_allclose(np.asarray(ema2.emas[0]["w"]), np.zeros(3))


def test_down_up_resize_matches_torchvision_chain():
    """down_up_resize must reproduce the reference's exact conditioning
    chain: torchvision bilinear (antialias) down by 4 then back up
    (training_loop.py:89-93)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3)),
                   np.float32)
    t = torch.as_tensor(x).permute(0, 3, 1, 2)
    low = F.interpolate(t, size=(16, 16), mode="bilinear", antialias=True)
    want = F.interpolate(low, size=(64, 64), mode="bilinear",
                         antialias=True).permute(0, 2, 3, 1).numpy()
    got = np.asarray(down_up_resize(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want, atol=2e-5)
