"""JAX-native InceptionV3 FID detector (TF-slim inception-2015-12-05 graph).

The reference computes FID features with NVIDIA's torch port of the original
TF-slim InceptionV3 pool3 graph (calculate_metrics.py:42-50, downloaded
pickle). Running the detector on the accelerator matters here: metric evals
push 10k+ images, and a torch-CPU sidecar on a 1-core host dominates eval
wall-clock.

The architecture is expressed ONCE as a data spec (`INCEPTION_V3_SPEC`) and
interpreted twice: by the JAX forward below (NHWC, jit/batch friendly) and by
a torch twin in the tests — so a random-weight parity test validates every
conv/bn/pool/padding decision without needing the real weights (no egress).

Real weights: `params_from_torch_module` maps a reconstructed NVIDIA-pickle
torch module into the param tree when `$VIVID_DETECTOR_DIR` has the pickle;
it is exercised by a weight-gated test. Feature contract matches the
reference detector: uint8 NHWC in, [N, 2048] float32 out.

BN semantics: TF-slim batch_norm (beta only, no scale, eps 1e-3, moving
stats). Preprocessing: TF1-style bilinear resize to 299 (corner-origin
src = dst*scale, the NVIDIA pickle's grid_sample emulation — see
tf1_resize_bilinear) then (x - 128)/128.
"""

from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Architecture spec. Node kinds:
#   ("conv", name, cout, (kh, kw), stride, pad)   pad in {"SAME", "VALID"}
#   ("max"|"avg", (kh, kw), stride, pad)
#   ("fan", (branch, ...))  — apply each branch (a node tuple) to the same
#                             input, concat results on channels
# A branch is a tuple of nodes applied sequentially. Names follow TF-slim so
# real-weight import is a name map.

def _c(name, cout, k, s=1, pad="SAME"):
    return ("conv", name, cout, (k, k) if isinstance(k, int) else k, s, pad)


def _prefix(node, pre):
    if node[0] == "conv":
        return (node[0], f"{pre}/{node[1]}") + node[2:]
    if node[0] == "fan":
        return ("fan", tuple(tuple(_prefix(n, pre) for n in br)
                             for br in node[1]))
    return node


def _mixed(name, *branches):
    return ("fan", tuple(
        tuple(_prefix(n, f"{name}/Branch_{i}") for n in br)
        for i, br in enumerate(branches)))


def _inception_a(name, pool_ch):
    return _mixed(
        name,
        (_c("Conv2d_0a_1x1", 64, 1),),
        (_c("Conv2d_0a_1x1", 48, 1), _c("Conv2d_0b_5x5", 64, 5)),
        (_c("Conv2d_0a_1x1", 64, 1), _c("Conv2d_0b_3x3", 96, 3),
         _c("Conv2d_0c_3x3", 96, 3)),
        (("avg", (3, 3), 1, "SAME"), _c("Conv2d_0b_1x1", pool_ch, 1)),
    )


def _inception_b(name, c7):
    return _mixed(
        name,
        (_c("Conv2d_0a_1x1", 192, 1),),
        (_c("Conv2d_0a_1x1", c7, 1), _c("Conv2d_0b_1x7", c7, (1, 7)),
         _c("Conv2d_0c_7x1", 192, (7, 1))),
        (_c("Conv2d_0a_1x1", c7, 1), _c("Conv2d_0b_7x1", c7, (7, 1)),
         _c("Conv2d_0c_1x7", c7, (1, 7)), _c("Conv2d_0d_7x1", c7, (7, 1)),
         _c("Conv2d_0e_1x7", 192, (1, 7))),
        (("avg", (3, 3), 1, "SAME"), _c("Conv2d_0b_1x1", 192, 1)),
    )


def _inception_c(name):
    return _mixed(
        name,
        (_c("Conv2d_0a_1x1", 320, 1),),
        (_c("Conv2d_0a_1x1", 384, 1),
         ("fan", ((_c("Conv2d_0b_1x3", 384, (1, 3)),),
                  (_c("Conv2d_0c_3x1", 384, (3, 1)),)))),
        (_c("Conv2d_0a_1x1", 448, 1), _c("Conv2d_0b_3x3", 384, 3),
         ("fan", ((_c("Conv2d_0c_1x3", 384, (1, 3)),),
                  (_c("Conv2d_0d_3x1", 384, (3, 1)),)))),
        (("avg", (3, 3), 1, "SAME"), _c("Conv2d_0b_1x1", 192, 1)),
    )


INCEPTION_V3_SPEC: Tuple = (
    _c("Conv2d_1a_3x3", 32, 3, s=2, pad="VALID"),
    _c("Conv2d_2a_3x3", 32, 3, pad="VALID"),
    _c("Conv2d_2b_3x3", 64, 3),
    ("max", (3, 3), 2, "VALID"),
    _c("Conv2d_3b_1x1", 80, 1, pad="VALID"),
    _c("Conv2d_4a_3x3", 192, 3, pad="VALID"),
    ("max", (3, 3), 2, "VALID"),
    _inception_a("Mixed_5b", 32),
    _inception_a("Mixed_5c", 64),
    _inception_a("Mixed_5d", 64),
    _mixed("Mixed_6a",
           (_c("Conv2d_1a_1x1", 384, 3, s=2, pad="VALID"),),
           (_c("Conv2d_0a_1x1", 64, 1), _c("Conv2d_0b_3x3", 96, 3),
            _c("Conv2d_1a_1x1", 96, 3, s=2, pad="VALID")),
           (("max", (3, 3), 2, "VALID"),)),
    _inception_b("Mixed_6b", 128),
    _inception_b("Mixed_6c", 160),
    _inception_b("Mixed_6d", 160),
    _inception_b("Mixed_6e", 192),
    _mixed("Mixed_7a",
           (_c("Conv2d_0a_1x1", 192, 1), _c("Conv2d_1a_3x3", 320, 3, s=2,
                                            pad="VALID")),
           (_c("Conv2d_0a_1x1", 192, 1), _c("Conv2d_0b_1x7", 192, (1, 7)),
            _c("Conv2d_0c_7x1", 192, (7, 1)),
            _c("Conv2d_1a_3x3", 192, 3, s=2, pad="VALID")),
           (("max", (3, 3), 2, "VALID"),)),
    _inception_c("Mixed_7b"),
    _inception_c("Mixed_7c"),
)

FEATURE_DIM = 2048
BN_EPS = 1e-3
INPUT_SIZE = 299


# ---------------------------------------------------------------------------
# Spec walking (shared by init, apply, and weight import).

def _walk_convs(spec, cin, out: list) -> int:
    """Append (name, cin, cout, kernel, stride, pad) for every conv in `spec`
    to `out` in topological order; return the sequence's out channels."""
    for node in spec:
        if node[0] == "conv":
            _, name, cout, k, s, pad = node
            out.append((name, cin, cout, k, s, pad))
            cin = cout
        elif node[0] == "fan":
            cin = sum(_walk_convs(br, cin, out) for br in node[1])
        # pools keep channels
    return cin


def iter_convs(spec=INCEPTION_V3_SPEC, cin=3):
    """(name, cin, cout, kernel, stride, pad) in topological order."""
    out: list = []
    _walk_convs(spec, cin, out)
    return out


def init_params(key) -> Dict[str, dict]:
    """Random-weight tree (for tests / parity; real use imports weights)."""
    params = {}
    for name, cin, cout, (kh, kw), _, _ in iter_convs():
        key, k1, k2, k3 = jax.random.split(key, 4)
        fan_in = cin * kh * kw
        params[name] = dict(
            w=jax.random.normal(k1, (kh, kw, cin, cout), jnp.float32)
            / np.sqrt(fan_in),
            beta=jax.random.normal(k2, (cout,)) * 0.1,
            mean=jax.random.normal(k3, (cout,)) * 0.1,
            var=jnp.ones((cout,)) + 0.1 * jax.random.uniform(key, (cout,)),
        )
    return params


def _conv_bn_relu(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.astype(jnp.float32)
    y = (y - p["mean"]) * jax.lax.rsqrt(p["var"] + BN_EPS) + p["beta"]
    return jax.nn.relu(y).astype(x.dtype)


def _pool(kind, x, k, stride, pad):
    kh, kw = k
    dims, strides = (1, kh, kw, 1), (1, stride, stride, 1)
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides,
                                     pad)
    # TF SAME avg-pool divides by the count of VALID cells under the window.
    s = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add, dims,
                              strides, pad)
    cnt = jax.lax.reduce_window(jnp.ones_like(x, jnp.float32), 0.0,
                                jax.lax.add, dims, strides, pad)
    return (s / cnt).astype(x.dtype)


def _apply_seq(params, spec, x):
    for node in spec:
        if node[0] == "conv":
            _, name, _, _, s, pad = node
            x = _conv_bn_relu(params[name], x, s, pad)
        elif node[0] in ("max", "avg"):
            _, k, s, pad = node
            x = _pool(node[0], x, k, s, pad)
        else:  # fan
            x = jnp.concatenate([_apply_seq(params, br, x) for br in node[1]],
                                axis=-1)
    return x


def tf1_resize_bilinear(x, out_h: int, out_w: int):
    """TF1 `tf.image.resize_bilinear(align_corners=False)` on NHWC arrays —
    source position = dst * (in/out) with border clamp (corner-origin, NOT
    half-pixel centers). This is what the NVIDIA inception-2015-12-05 pickle
    emulates internally via affine_grid/grid_sample (its theta shift works
    out to src = dst*scale exactly), and FID is sensitive to the resize
    kernel, so jax.image.resize (half-pixel) is NOT equivalent. Works on
    jnp and np arrays (gather + lerp; indices/weights are trace-constant)."""
    h, w = x.shape[1], x.shape[2]

    def axis(in_size, out_size):
        p = np.arange(out_size) * (in_size / out_size)
        i0 = np.floor(p).astype(np.int32)
        t = (p - i0).astype(np.float32)
        i1 = np.minimum(i0 + 1, in_size - 1)
        return i0, i1, t

    y0, y1, ty = axis(h, out_h)
    x0, x1, tx = axis(w, out_w)
    rows = x[:, y0] * (1.0 - ty)[None, :, None, None] \
        + x[:, y1] * ty[None, :, None, None]
    return rows[:, :, x0] * (1.0 - tx)[None, None, :, None] \
        + rows[:, :, x1] * tx[None, None, :, None]


def preprocess(images_uint8):
    """uint8 NHWC (any HxW, 3ch) -> fp32 299x299 scaled (x-128)/128, matching
    the NVIDIA pickle's forward (TF1 bilinear resize then x = (x-128)/128)."""
    x = jnp.asarray(images_uint8).astype(jnp.float32)
    h, w = x.shape[1], x.shape[2]
    if (h, w) != (INPUT_SIZE, INPUT_SIZE):
        x = tf1_resize_bilinear(x, INPUT_SIZE, INPUT_SIZE)
    return (x - 128.0) / 128.0


@partial(jax.jit, static_argnames=("use_bf16",))
def inception_features(params, images_uint8, use_bf16: bool = True):
    """uint8 NHWC -> [N, 2048] float32 pool3 features."""
    x = preprocess(images_uint8)
    if use_bf16:
        x = x.astype(jnp.bfloat16)
    y = _apply_seq(params, INCEPTION_V3_SPEC, x)
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2))


# ---------------------------------------------------------------------------
# Weight import from the NVIDIA torch pickle (gated on local weights).

def params_from_torch_module(net) -> Dict[str, dict]:
    """Map a reconstructed inception-2015-12-05 torch module's state into the
    spec's param tree. The port keeps one (conv, bn) pair per TF-slim conv in
    topological order, so we match by order and validate by shape."""
    convs, bns = [], []
    for m in net.modules():
        cls = type(m).__name__.lower()
        if hasattr(m, "weight") and getattr(m, "weight", None) is not None:
            wd = m.weight.detach().cpu().numpy()
            if wd.ndim == 4 and "conv" in cls:
                convs.append(m)
            elif ("batchnorm" in cls or "bn" in cls
                  or hasattr(m, "running_mean")):
                bns.append(m)
        elif hasattr(m, "running_mean") and m.running_mean is not None:
            bns.append(m)
    spec_convs = list(iter_convs())
    if len(convs) != len(spec_convs):
        raise ValueError(f"torch module has {len(convs)} convs, spec expects "
                         f"{len(spec_convs)} — not an inception-2015-12-05 "
                         "module this importer understands")
    params = {}
    for (name, cin, cout, (kh, kw), _, _), conv in zip(spec_convs, convs):
        w = conv.weight.detach().cpu().numpy()
        if w.shape != (cout, cin, kh, kw):
            raise ValueError(f"{name}: torch conv weight {w.shape} != "
                             f"spec {(cout, cin, kh, kw)}")
        entry = dict(w=jnp.asarray(w.transpose(2, 3, 1, 0)))
        bias = getattr(conv, "bias", None)
        bn = bns.pop(0) if bns else None
        if bn is not None and bn.running_mean.shape[0] == cout:
            entry["mean"] = jnp.asarray(bn.running_mean.detach().cpu().numpy())
            entry["var"] = jnp.asarray(bn.running_var.detach().cpu().numpy())
            beta = bn.bias if getattr(bn, "bias", None) is not None else None
            entry["beta"] = (jnp.asarray(beta.detach().cpu().numpy())
                             if beta is not None else jnp.zeros((cout,)))
        else:
            entry["mean"] = jnp.zeros((cout,))
            entry["var"] = jnp.ones((cout,))
            entry["beta"] = (jnp.asarray(bias.detach().cpu().numpy())
                             if bias is not None else jnp.zeros((cout,)))
        params[name] = entry
    return params


# ---------------------------------------------------------------------------
# Torch twin built from the same spec — used by the parity tests and any
# environment that wants a CPU cross-check. Requires torch.

def build_torch_twin(params):
    """A torch callable computing the same function as inception_features
    (fp32), weights copied from the given param tree."""
    import torch
    import torch.nn.functional as F

    tp = {name: {k: torch.as_tensor(np.asarray(v, np.float32))
                 for k, v in entry.items()}
          for name, entry in params.items()}

    def conv_bn_relu(name, x, stride, pad, k):
        p = tp[name]
        w = p["w"].permute(3, 2, 0, 1)  # HWIO -> OIHW
        if pad == "SAME":
            kh, kw = k
            x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2))
        y = F.conv2d(x, w, stride=stride)
        y = (y - p["mean"].view(1, -1, 1, 1)) \
            / torch.sqrt(p["var"].view(1, -1, 1, 1) + BN_EPS) \
            + p["beta"].view(1, -1, 1, 1)
        return F.relu(y)

    def pool(kind, x, k, stride, pad):
        padding = (k[0] // 2, k[1] // 2) if pad == "SAME" else 0
        if kind == "max":
            return F.max_pool2d(x, k, stride, padding)
        return F.avg_pool2d(x, k, stride, padding, count_include_pad=False)

    def apply_seq(spec, x):
        for node in spec:
            if node[0] == "conv":
                _, name, _, k, s, pad = node
                x = conv_bn_relu(name, x, s, pad, k)
            elif node[0] in ("max", "avg"):
                _, k, s, pad = node
                x = pool(node[0], x, k, s, pad)
            else:
                x = torch.cat([apply_seq(br, x) for br in node[1]], dim=1)
        return x

    def forward(images_uint8):
        with torch.no_grad():
            xn = np.asarray(images_uint8, np.float32)
            if xn.shape[1:3] != (INPUT_SIZE, INPUT_SIZE):
                xn = tf1_resize_bilinear(xn, INPUT_SIZE, INPUT_SIZE)
            x = torch.as_tensor(xn).permute(0, 3, 1, 2)
            x = (x - 128.0) / 128.0
            y = apply_seq(INCEPTION_V3_SPEC, x)
            return y.mean(dim=(2, 3)).numpy()

    return forward
