"""MobileNetV5 (gemma3n vision tower) vs a torch oracle built from the
reference spec (`vision_models/gemma3n/vision.rs`) — no timm/HF class
exists in this image, so the oracle reimplements the block semantics in
torch and both are checked against each other on a reduced block table
(same code paths: EdgeResidual, UIR with/without dw convs, MobileAttention
with kv_stride 1/2, MSFA fusion + pooling)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mistralrs_tpu.vision.mobilenetv5 import (
    Edge,
    Mqa,
    Uir,
    conv2d,
    gemma3n_mobilenet_def,
    make_divisible,
    mobilenetv5_weights_from_state_dict,
    vision_tower_forward,
)

# Small but structurally complete table: every block type + both MQA modes
DEF = (
    (Edge(16, 3, 2, 4.0), Edge(16, 3, 1, 4.0)),
    (Uir(24, 3, 5, 2, 6.0), Uir(24, 5, 0, 1, 4.0), Uir(24, 0, 0, 1, 2.0)),
    (Uir(32, 5, 5, 2, 6.0), Mqa(2, 8, 2), Uir(32, 0, 0, 1, 2.0)),
    (Uir(48, 5, 5, 2, 6.0), Mqa(4, 8, 1), Uir(48, 0, 0, 1, 2.0)),
)
STEM = 8


def _torch_pad_same(x, k, s, d=1):
    ih, iw = x.shape[-2:]
    eff = d * (k - 1) + 1
    oh, ow = -(-ih // s), -(-iw // s)
    ph = max((oh - 1) * s + eff - ih, 0)
    pw = max((ow - 1) * s + eff - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def _torch_rms2d(x, w, eps, act):
    # channel-last rms norm on NCHW input
    y = x.permute(0, 2, 3, 1).float()
    y = y * torch.rsqrt(y.pow(2).mean(-1, keepdim=True) + eps)
    y = y * w
    if act:
        y = F.gelu(y, approximate="none")
    return y.permute(0, 3, 1, 2)


class _O:
    """Torch oracle for the tower (reference-spec semantics)."""

    def __init__(self, sd, prefix="model.vision_tower.timm_model."):
        self.sd = {k[len(prefix):]: torch.tensor(np.asarray(v))
                   for k, v in sd.items() if k.startswith(prefix)}

    def conv(self, x, name, stride=1, groups=1, same=True, bias=None):
        w = self.sd[name + ".weight"]
        k = w.shape[-1]
        if same and k > 1:
            x = _torch_pad_same(x, k, stride)
        b = self.sd.get(name + ".bias") if bias is None else bias
        return F.conv2d(x, w, b, stride=stride, groups=groups)

    def cna(self, x, name, stride=1, groups=1, act=True, eps=1e-5):
        x = self.conv(x, name + ".conv", stride=stride, groups=groups)
        return _torch_rms2d(x, self.sd[name + ".bn.weight"], eps, act)

    def edge(self, x, p, blk):
        sc, in_ch = x, x.shape[1]
        y = self.conv(x, p + "conv_exp", stride=blk.stride)
        y = _torch_rms2d(y, self.sd[p + "bn1.weight"], 1e-5, True)
        y = self.conv(y, p + "conv_pwl", same=False)
        y = _torch_rms2d(y, self.sd[p + "bn2.weight"], 1e-5, False)
        return y + sc if (in_ch == blk.out and blk.stride == 1) else y

    def uir(self, x, p, blk):
        sc, in_ch = x, x.shape[1]
        y = x
        if blk.start_k > 0:
            s = 1 if blk.mid_k > 0 else blk.stride
            y = self.cna(y, p + "dw_start", stride=s, groups=in_ch, act=False)
        y = self.cna(y, p + "pw_exp", act=True)
        if blk.mid_k > 0:
            y = self.cna(y, p + "dw_mid", stride=blk.stride,
                         groups=y.shape[1], act=True)
        y = self.cna(y, p + "pw_proj", act=False)
        if p + "layer_scale.gamma" in self.sd:
            y = y * self.sd[p + "layer_scale.gamma"].view(1, -1, 1, 1)
        return y + sc if (in_ch == blk.out and blk.stride == 1) else y

    def mqa(self, x, p, blk):
        sc = x
        b, c, h, w = x.shape
        y = _torch_rms2d(x, self.sd[p + "norm.weight"], 1e-5, False)
        kd = blk.kv_dim
        q = self.conv(y, p + "attn.query.proj", same=False)
        q = q.permute(0, 2, 3, 1).reshape(b, h * w, blk.heads, kd)
        q = q.permute(0, 2, 1, 3)  # [B, n, HW, kd]
        k = v = y
        if blk.kv_stride > 1:
            k = self.conv(k, p + "attn.key.down_conv",
                          stride=blk.kv_stride, groups=c)
            k = _torch_rms2d(k, self.sd[p + "attn.key.norm.weight"], 1e-6, False)
            v = self.conv(v, p + "attn.value.down_conv",
                          stride=blk.kv_stride, groups=c)
            v = _torch_rms2d(v, self.sd[p + "attn.value.norm.weight"], 1e-6, False)
        k = self.conv(k, p + "attn.key.proj", same=False)
        k = k.permute(0, 2, 3, 1).reshape(b, 1, -1, kd)
        v = self.conv(v, p + "attn.value.proj", same=False)
        v = v.permute(0, 2, 3, 1).reshape(b, 1, -1, kd)
        o = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
        o = o.permute(0, 2, 1, 3).reshape(b, h, w, blk.heads * kd)
        o = o.permute(0, 3, 1, 2)
        o = self.conv(o, p + "attn.output.proj", same=False)
        if p + "layer_scale.gamma" in self.sd:
            o = o * self.sd[p + "layer_scale.gamma"].view(1, -1, 1, 1)
        return o + sc

    def forward(self, px, block_def, msfa_indices=(3, 4), out_res=(2, 2)):
        x = self.cna(px, "conv_stem", stride=2, act=True)
        feats = []
        for si, stage in enumerate(block_def):
            for bi, blk in enumerate(stage):
                p = f"blocks.{si}.{bi}."
                if isinstance(blk, Edge):
                    x = self.edge(x, p, blk)
                elif isinstance(blk, Uir):
                    x = self.uir(x, p, blk)
                else:
                    x = self.mqa(x, p, blk)
            if si + 1 in msfa_indices:
                feats.append(x)
        h0, w0 = feats[0].shape[-2:]
        ups = [f if f.shape[-2] >= h0 else
               F.interpolate(f, size=(h0, w0), mode="nearest") for f in feats]
        x = torch.cat(ups, dim=1)
        x = self.cna(x, "msfa.ffn.pw_exp", act=True)
        x = self.cna(x, "msfa.ffn.pw_proj", act=False)
        oh, ow = out_res
        if (h0, w0) != (oh, ow):
            x = F.avg_pool2d(x, (h0 // oh, w0 // ow))
        x = _torch_rms2d(x, self.sd["msfa.norm.weight"], 1e-6, False)
        return x


def _synthetic_sd(block_def, stem_out=STEM, msfa_out=20, seed=0,
                  prefix="model.vision_tower.timm_model."):
    rng = np.random.default_rng(seed)

    def r(*s):
        return (rng.standard_normal(s) * 0.2).astype(np.float32)

    sd = {}

    def cna(name, cin, cout, k, bias=False):
        sd[prefix + name + ".conv.weight"] = r(cout, cin, k, k)
        if bias:
            sd[prefix + name + ".conv.bias"] = r(cout)
        sd[prefix + name + ".bn.weight"] = 1.0 + r(cout) * 0.1

    def dw(name, c, k):
        sd[prefix + name + ".conv.weight"] = r(c, 1, k, k)
        sd[prefix + name + ".bn.weight"] = 1.0 + r(c) * 0.1

    cna("conv_stem", 3, stem_out, 3, bias=True)
    cin = stem_out
    for si, stage in enumerate(block_def):
        for bi, blk in enumerate(stage):
            p = f"blocks.{si}.{bi}"
            if isinstance(blk, Edge):
                mid = make_divisible(cin * blk.expand)
                sd[prefix + p + ".conv_exp.weight"] = r(mid, cin, blk.kernel, blk.kernel)
                sd[prefix + p + ".bn1.weight"] = 1.0 + r(mid) * 0.1
                sd[prefix + p + ".conv_pwl.weight"] = r(blk.out, mid, 1, 1)
                sd[prefix + p + ".bn2.weight"] = 1.0 + r(blk.out) * 0.1
                cin = blk.out
            elif isinstance(blk, Uir):
                mid = make_divisible(cin * blk.expand)
                if blk.start_k > 0:
                    dw(p + ".dw_start", cin, blk.start_k)
                cna(p + ".pw_exp", cin, mid, 1)
                if blk.mid_k > 0:
                    dw(p + ".dw_mid", mid, blk.mid_k)
                cna(p + ".pw_proj", mid, blk.out, 1)
                sd[prefix + p + ".layer_scale.gamma"] = 1.0 + r(blk.out) * 0.1
                cin = blk.out
            else:
                kd = blk.kv_dim
                sd[prefix + p + ".norm.weight"] = 1.0 + r(cin) * 0.1
                sd[prefix + p + ".attn.query.proj.weight"] = r(blk.heads * kd, cin, 1, 1)
                if blk.kv_stride > 1:
                    sd[prefix + p + ".attn.key.down_conv.weight"] = r(cin, 1, 3, 3)
                    sd[prefix + p + ".attn.key.norm.weight"] = 1.0 + r(cin) * 0.1
                    sd[prefix + p + ".attn.value.down_conv.weight"] = r(cin, 1, 3, 3)
                    sd[prefix + p + ".attn.value.norm.weight"] = 1.0 + r(cin) * 0.1
                sd[prefix + p + ".attn.key.proj.weight"] = r(kd, cin, 1, 1)
                sd[prefix + p + ".attn.value.proj.weight"] = r(kd, cin, 1, 1)
                sd[prefix + p + ".attn.output.proj.weight"] = r(cin, blk.heads * kd, 1, 1)
                sd[prefix + p + ".layer_scale.gamma"] = 1.0 + r(cin) * 0.1
    fused = block_def[-2][-1].out + block_def[-1][-1].out
    mid = make_divisible(fused * 2.0)
    cna("msfa.ffn.pw_exp", fused, mid, 1)
    cna("msfa.ffn.pw_proj", mid, msfa_out, 1)
    sd[prefix + "msfa.norm.weight"] = 1.0 + r(msfa_out) * 0.1
    return sd


def test_make_divisible_matches_reference():
    assert make_divisible(64 * 4.0) == 256
    assert make_divisible(640 * 2.0) == 1280
    assert make_divisible(7.0) == 8
    # 0.9 round-down guard: 100*0.92=92 → floor-to-88 < 0.9*92 → +8
    assert make_divisible(92) == 88 + 8 if 88 < 0.9 * 92 else 88


def test_same_pad_conv_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 13, 11, 4)).astype(np.float32)
    w = rng.standard_normal((5, 4, 3, 3)).astype(np.float32)  # OIHW
    ours = conv2d(jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                  stride=2)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    ref = F.conv2d(_torch_pad_same(xt, 3, 2), torch.tensor(w), stride=2)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5
    )


def test_tower_matches_torch_oracle():
    sd = _synthetic_sd(DEF)
    weights = mobilenetv5_weights_from_state_dict(sd, block_def=DEF)
    rng = np.random.default_rng(3)
    px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = vision_tower_forward(weights, jnp.asarray(px), block_def=DEF,
                               out_res=(2, 2))
    with torch.no_grad():
        ref = _O(sd).forward(
            torch.tensor(np.transpose(px, (0, 3, 1, 2))), DEF, out_res=(2, 2)
        )
    ref = ref.permute(0, 2, 3, 1).reshape(2, 4, -1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)
    assert got.shape == (2, 4, 20)


def test_full_def_shapes():
    """The real gemma3n table: stage channel widths, stride schedule, and
    the MSFA [B, 256, 2048] output contract (on a reduced input size)."""
    d = gemma3n_mobilenet_def()
    assert [len(s) for s in d] == [3, 5, 37, 39]
    assert d[2][-2] == Mqa(12, 64, 2) and d[3][-2] == Mqa(16, 96, 1)
    outs = [s[-1].out for s in d]
    assert outs == [128, 256, 640, 1280]


def test_vision_embedder_soft_path():
    from mistralrs_tpu.vision.mobilenetv5 import (
        embed_vision_soft, gemma3n_vision_embedder_from_state_dict,
    )

    rng = np.random.default_rng(1)
    H_mm, H_txt = 8, 12
    sd = {
        "model.embed_vision.soft_embedding_norm.weight": np.ones(H_mm, np.float32),
        "model.embed_vision.embedding_projection.weight":
            rng.standard_normal((H_txt, H_mm)).astype(np.float32),
        "model.embed_vision.embedding.weight":
            rng.standard_normal((4, H_mm)).astype(np.float32),
        "model.embed_vision.hard_embedding_norm.weight": np.ones(H_mm, np.float32),
    }
    emb = gemma3n_vision_embedder_from_state_dict(sd)
    soft = jnp.asarray(rng.standard_normal((1, 5, H_mm)), jnp.float32)
    out = embed_vision_soft(emb, soft)
    assert out.shape == (1, 5, H_txt)
    # output is row-rms-normalized (final norm has no scale)
    norms = np.sqrt(np.mean(np.asarray(out) ** 2, -1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
