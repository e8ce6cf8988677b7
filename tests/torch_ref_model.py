"""Independent PyTorch implementation of the bidirectional LLaMA-style
transformer, used as the cross-framework logits oracle.

Written from the architecture conventions (HF LLaMA/Qwen2): RMSNorm in f32,
rotate-half RoPE, GQA with repeated kv heads, SwiGLU.  This is the stand-in
for the HF remote-code forwards the reference loads at runtime — it lets the
test suite assert "our JAX transformer + checkpoint loader reproduce a torch
model's logits" end to end (SURVEY.md §7 hard-part 2), which is the part of
HF parity that is checkable offline.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        dt = x.dtype
        x = x.float()
        x = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps)
        return (x * self.weight.float()).to(dt)


def rope_cos_sin(seq_len, head_dim, theta, device):
    half = head_dim // 2
    freqs = 1.0 / (theta ** (torch.arange(0, half, dtype=torch.float32,
                                          device=device) / half))
    ang = torch.arange(seq_len, dtype=torch.float32, device=device)[:, None] * freqs
    return torch.cos(ang), torch.sin(ang)  # [S, half]


def apply_rope(x, cos, sin):
    # x: [B, S, H, Dh]; rotate pairs (first half, second half)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half].float(), x[..., half:].float()
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)
    return out.to(x.dtype)


class TorchBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, h, kv, dh = cfg["hidden"], cfg["heads"], cfg["kv_heads"], cfg["head_dim"]
        f = cfg["ffn"]
        bias = cfg.get("attention_bias", False)
        self.h, self.kv, self.dh = h, kv, dh
        self.input_layernorm = TorchRMSNorm(d, cfg["eps"])
        self.q_proj = nn.Linear(d, h * dh, bias=bias)
        self.k_proj = nn.Linear(d, kv * dh, bias=bias)
        self.v_proj = nn.Linear(d, kv * dh, bias=bias)
        self.o_proj = nn.Linear(h * dh, d, bias=False)
        self.post_attention_layernorm = TorchRMSNorm(d, cfg["eps"])
        self.gate_proj = nn.Linear(d, f, bias=False)
        self.up_proj = nn.Linear(d, f, bias=False)
        self.down_proj = nn.Linear(f, d, bias=False)
        self.qk_norm = cfg.get("qk_norm", False)
        if self.qk_norm:
            self.q_norm = TorchRMSNorm(dh, cfg["eps"])
            self.k_norm = TorchRMSNorm(dh, cfg["eps"])

    def forward(self, x, cos, sin):
        b, s, d = x.shape
        hn = self.input_layernorm(x)
        q = self.q_proj(hn).view(b, s, self.h, self.dh)
        k = self.k_proj(hn).view(b, s, self.kv, self.dh)
        v = self.v_proj(hn).view(b, s, self.kv, self.dh)
        if self.qk_norm:
            q, k = self.q_norm(q), self.k_norm(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        rep = self.h // self.kv
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        # bidirectional (no causal mask), softmax in f32
        att = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) / math.sqrt(self.dh)
        p = torch.softmax(att, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", p, v.float()).reshape(b, s, -1)
        x = x + self.o_proj(o.to(x.dtype))

        hn = self.post_attention_layernorm(x)
        x = x + self.down_proj(nn.functional.silu(self.gate_proj(hn)) * self.up_proj(hn))
        return x


class TorchExpert(nn.Module):
    def __init__(self, d, fm):
        super().__init__()
        self.gate_proj = nn.Linear(d, fm, bias=False)
        self.up_proj = nn.Linear(d, fm, bias=False)
        self.down_proj = nn.Linear(fm, d, bias=False)

    def forward(self, x):
        return self.down_proj(nn.functional.silu(self.gate_proj(x)) * self.up_proj(x))


class TorchMoE(nn.Module):
    """Router + per-expert SwiGLU FFNs + shared expert, mirroring the
    Bailing/LLaDA-MoE semantics our models/moe.py implements: f32 softmax
    over ALL experts, top-k, optional renormalization of the selected
    probs, shared expert always added."""

    def __init__(self, cfg):
        super().__init__()
        d, fm = cfg["hidden"], cfg["moe_ffn"]
        self.top_k = cfg["top_k"]
        self.norm_topk = cfg.get("norm_topk", True)
        self.gate = nn.Linear(d, cfg["experts"], bias=False)  # router
        self.experts = nn.ModuleList(
            TorchExpert(d, fm) for _ in range(cfg["experts"]))
        self.shared_experts = TorchExpert(d, fm)

    def forward(self, x):
        b, s, d = x.shape
        flat = x.reshape(-1, d)
        probs = torch.softmax(self.gate(flat.float()), dim=-1)
        topk_p, topk_i = torch.topk(probs, self.top_k, dim=-1)
        if self.norm_topk:
            topk_p = topk_p / topk_p.sum(-1, keepdim=True)
        out = torch.zeros_like(flat)
        for e, expert in enumerate(self.experts):
            sel = (topk_i == e)
            w = (topk_p * sel).sum(-1)  # [N] combine weight for expert e
            rows = w > 0
            if rows.any():
                out[rows] += w[rows, None] * expert(flat[rows])
        out = out + self.shared_experts(flat)
        return out.reshape(b, s, d)


class TorchMoEBlock(nn.Module):
    """Attention block + MoE FFN (same attention as TorchBlock)."""

    def __init__(self, cfg):
        super().__init__()
        self.attn = TorchBlock(cfg)   # reuse attention; we bypass its mlp
        self.mlp = TorchMoE(cfg)

    def forward(self, x, cos, sin):
        a = self.attn
        b, s, d = x.shape
        hn = a.input_layernorm(x)
        q = a.q_proj(hn).view(b, s, a.h, a.dh)
        k = a.k_proj(hn).view(b, s, a.kv, a.dh)
        v = a.v_proj(hn).view(b, s, a.kv, a.dh)
        if a.qk_norm:
            q, k = a.q_norm(q), a.k_norm(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        rep = a.h // a.kv
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        att = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) / math.sqrt(a.dh)
        p = torch.softmax(att, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", p, v.float()).reshape(b, s, -1)
        x = x + a.o_proj(o.to(x.dtype))
        x = x + self.mlp(a.post_attention_layernorm(x))
        return x


class TorchTinyMoELM(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.embed_tokens = nn.Embedding(cfg["vocab"], cfg["hidden"])
        self.layers = nn.ModuleList(TorchMoEBlock(cfg) for _ in range(cfg["layers"]))
        self.norm = TorchRMSNorm(cfg["hidden"], cfg["eps"])
        self.lm_head = nn.Linear(cfg["hidden"], cfg["vocab"], bias=False)

    def forward(self, ids):
        x = self.embed_tokens(ids)
        cos, sin = rope_cos_sin(ids.shape[1], self.cfg["head_dim"],
                                self.cfg["theta"], ids.device)
        for layer in self.layers:
            x = layer(x, cos, sin)
        return self.lm_head(self.norm(x)).float()

    def hf_state_dict(self, expert_layout: str = "per_expert"):
        """Canonical HF names.  ``expert_layout``:
        - 'per_expert':  mlp.experts.{e}.gate_proj.weight  [Fm, D] each
        - 'stacked':     mlp.experts.gate_proj.weight      [E, Fm, D]
        - 'mixtral':     block_sparse_moe.experts.{e}.w1/w3/w2
        """
        out = {"model.embed_tokens.weight": self.embed_tokens.weight,
               "model.norm.weight": self.norm.weight,
               "lm_head.weight": self.lm_head.weight}
        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            a = layer.attn
            out[pre + "input_layernorm.weight"] = a.input_layernorm.weight
            out[pre + "post_attention_layernorm.weight"] = a.post_attention_layernorm.weight
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                mod = getattr(a, name)
                out[pre + f"self_attn.{name}.weight"] = mod.weight
                if mod.bias is not None:
                    out[pre + f"self_attn.{name}.bias"] = mod.bias
            if a.qk_norm:
                out[pre + "self_attn.q_norm.weight"] = a.q_norm.weight
                out[pre + "self_attn.k_norm.weight"] = a.k_norm.weight

            moe = layer.mlp
            for name in ("gate_proj", "up_proj", "down_proj"):
                out[pre + f"mlp.shared_experts.{name}.weight"] = \
                    getattr(moe.shared_experts, name).weight
            if expert_layout == "mixtral":
                out[pre + "block_sparse_moe.gate.weight"] = moe.gate.weight
                alias = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}
                for e, expert in enumerate(moe.experts):
                    for w, name in alias.items():
                        out[pre + f"block_sparse_moe.experts.{e}.{w}.weight"] = \
                            getattr(expert, name).weight
            else:
                out[pre + "mlp.gate.weight"] = moe.gate.weight
                if expert_layout == "stacked":
                    for name in ("gate_proj", "up_proj", "down_proj"):
                        out[pre + f"mlp.experts.{name}.weight"] = torch.stack(
                            [getattr(ex, name).weight for ex in moe.experts])
                else:
                    for e, expert in enumerate(moe.experts):
                        for name in ("gate_proj", "up_proj", "down_proj"):
                            out[pre + f"mlp.experts.{e}.{name}.weight"] = \
                                getattr(expert, name).weight
        return {k: v.detach().cpu().numpy() for k, v in out.items()}


class TorchTinyLM(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.embed_tokens = nn.Embedding(cfg["vocab"], cfg["hidden"])
        self.layers = nn.ModuleList(TorchBlock(cfg) for _ in range(cfg["layers"]))
        self.norm = TorchRMSNorm(cfg["hidden"], cfg["eps"])
        self.lm_head = nn.Linear(cfg["hidden"], cfg["vocab"], bias=False)

    def forward(self, ids):
        x = self.embed_tokens(ids)
        cos, sin = rope_cos_sin(ids.shape[1], self.cfg["head_dim"],
                                self.cfg["theta"], ids.device)
        for layer in self.layers:
            x = layer(x, cos, sin)
        x = self.norm(x)
        return self.lm_head(x).float()

    def hf_state_dict(self):
        """State dict under canonical HF LLaMA names."""
        out = {"model.embed_tokens.weight": self.embed_tokens.weight,
               "model.norm.weight": self.norm.weight,
               "lm_head.weight": self.lm_head.weight}
        for i, layer in enumerate(self.layers):
            pre = f"model.layers.{i}."
            out[pre + "input_layernorm.weight"] = layer.input_layernorm.weight
            out[pre + "post_attention_layernorm.weight"] = layer.post_attention_layernorm.weight
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                mod = getattr(layer, name)
                out[pre + f"self_attn.{name}.weight"] = mod.weight
                if mod.bias is not None:
                    out[pre + f"self_attn.{name}.bias"] = mod.bias
            if layer.qk_norm:
                out[pre + "self_attn.q_norm.weight"] = layer.q_norm.weight
                out[pre + "self_attn.k_norm.weight"] = layer.k_norm.weight
            for name in ("gate_proj", "up_proj", "down_proj"):
                out[pre + f"mlp.{name}.weight"] = getattr(layer, name).weight
        return {k: v.detach().cpu().numpy() for k, v in out.items()}


class TorchTinyDreamLM(TorchTinyLM):
    """Qwen2.5-derived Dream/DiffuCoder forward: QKV bias (o_proj stays
    bias-free), GQA, and the shifted-logit head convention where position
    i-1's logits predict token i — the token shift the reference delegates
    to remote-code ``diffusion_generate``
    (Pre-Trained/bench_models/dream.py:70-110).  Position 0 keeps its own
    logits (no left neighbor) — the shift-at-position-0 convention is a named
    parity risk (docs/PARITY.md §3)."""

    def forward(self, ids):
        logits = super().forward(ids)
        return torch.cat([logits[:, :1], logits[:, :-1]], dim=1)
