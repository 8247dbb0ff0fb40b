"""Dispatch-gate regression guard for the packed Pallas kernels.

The VMEM-budget gates (_packed_eligible / _packed_bwd_fits) decide whether
an attention site runs the packed kernels or the XLA composite. A round-3
gate tweak silently dropped the hot ch=64 xattn off the packed BACKWARD
(train step 89.7 -> ~140 ms) while the on-chip parity tests kept passing —
both sides of the comparison had quietly become the XLA composite. These
tests make that class of regression loud: every attention shape of the three
production configs (vivid-base ch=64 profile, flagship ch=128, vivid-sr)
must stay on the packed kernels, forward AND backward.
"""

import pytest

PRODUCTION_CONFIGS = {
    # The reference's profiled base model (train_nvs.py presets).
    "base-ch64": dict(img_resolution=64, num_sources=2, model_channels=64,
                      extra_attn=1),
    # The flagship serving/training config (BASELINE.md).
    "flagship-ch128": dict(img_resolution=64, num_sources=2,
                           model_channels=128, extra_attn=1,
                           source_label_dim=20, target_label_dim=40),
    # The super-resolution stage — the size-documented architecture
    # (experiments/log.txt:720-792 param table, 57.55M: extra_attn=1,
    # single-source, labels 20/20; see tools/bench_serve.sr_config).
    "sr-256": dict(img_resolution=256, num_sources=1, model_channels=64,
                   super_res=True, extra_attn=1, source_label_dim=20,
                   target_label_dim=20),
}

# The packed whole-row kernels cover 64 <= S <= 2048. The SR model's
# 128x128/64x64 attention (S=16384/4096) is OUTSIDE that envelope by design —
# those sites must ride the stock flash kernel instead (fused_attention's
# _use_pallas dispatch), never the einsum fallback.
PACKED_MAX_S = 2048


def _attn_sites(pcfg):
    """(block name, S, extra_lens, num_heads, head_dim) for every
    attention-bearing block of the denoiser AND the feature encoder."""
    from vivid_tpu.nn.unet import build_plan
    sites = []
    for ucfg in (pcfg.unet_cfg, pcfg.encoder_cfg):
        if ucfg is None:
            continue
        enc, dec = build_plan(ucfg)
        for e in enc + dec:
            bc = e.block
            if bc is None or bc.num_heads == 0:
                continue
            s = e.res * e.res
            extra = ((s,) * bc.num_cross_sources) if bc.xattn else ()
            sites.append((e.name, s, extra, bc.num_heads,
                          bc.channels_per_head))
    return sites


@pytest.mark.parametrize("name", sorted(PRODUCTION_CONFIGS))
def test_production_shapes_stay_on_packed_kernels(name, monkeypatch):
    # Satisfy the gate's platform check off-TPU; the budget math is the
    # same either way.
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import (_packed_bwd_fits,
                                             _packed_eligible, _use_pallas)
    from vivid_tpu.nn.precond import PrecondConfig

    pcfg = PrecondConfig(**PRODUCTION_CONFIGS[name])
    sites = _attn_sites(pcfg)
    assert sites, "no attention sites found — plan walk broke"
    saw_xattn = False
    for nm, s, extra, H, d in sites:
        why = (name, nm, s, extra, H, d)
        if s > PACKED_MAX_S:
            # Big-S SR sites: outside the packed envelope; must still ride
            # the stock flash kernel (blockwise online softmax).
            assert not _packed_eligible(s, extra, num_heads=H, head_dim=d,
                                        itemsize=2), why
            import jax.numpy as jnp
            q = jnp.zeros((1, H, s, d), jnp.bfloat16)
            k = jnp.zeros((1, H, s + sum(extra), d), jnp.bfloat16)
            assert _use_pallas(q, k), ("stock flash rejects big-S site", why)
            continue
        assert _packed_eligible(s, extra, num_heads=H, head_dim=d,
                                itemsize=2), ("forward gate rejects", why)
        assert _packed_bwd_fits(s, extra, H, d, 2, 0), \
            ("backward gate rejects", why)
        if extra:
            saw_xattn = True
            # The uncond twin runs the SELF kernel with a zero sink at the
            # same shape (blocks.py: features == "zeros").
            assert _packed_eligible(s, num_heads=H, head_dim=d, itemsize=2), \
                ("uncond forward gate rejects", why)
            assert _packed_bwd_fits(s, (), H, d, 2, 0), \
                ("uncond backward gate rejects", why)
    assert saw_xattn, "no cross-attention sites found — plan walk broke"


def test_oversized_bias_shape_falls_back(monkeypatch):
    """The biased SR-like H=8 shape (two 33 MB fp32 bias slabs, doubled in
    the backward) genuinely exceeds the VMEM budget — it must KEEP falling
    back to the composite VJP rather than erroring at Mosaic compile time."""
    monkeypatch.setenv("VIVID_PALLAS_INTERPRET", "1")
    from vivid_tpu.kernels.attention import _packed_bwd_fits
    assert not _packed_bwd_fits(1024, (1024, 1024), 8, 32, 2, 2)
