"""DETR (reference tlxcv/models/detection/detr.py: Detr :7-283, frozen-BN
ResNet50 :284/:397, sine position embedding :1065, transformer :611-964,
DetrHungarianMatcher :1124, DetrLoss :1232) — TPU-native NHWC.

TPU-first deltas from the reference:
- GT is padded `[B, M]` with a mask — no ragged `nested_tensor` batching
  (reference :1546); images are fixed-size NHWC.
- Hungarian matching runs through `ops.hungarian.hungarian_callback`
  (jit-safe host callback) instead of an in-loss scipy call; padded GT
  rows carry a constant cost and are masked out of every loss term.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as I
from ...core.module import BatchStat, Module, Param, is_training
from ...nn.attention import scaled_dot_product_attention
from ...ops.boxes import aligned_iou, xywh2xyxy
from ...ops.hungarian import auction_assign, hungarian_callback

__all__ = ["Detr", "DetrLoss", "detr_resnet50"]


class FrozenBatchNorm(Module):
    """BN with all four buffers frozen (reference frozen-BN ResNet :284)."""

    def __init__(self, n):
        self.weight = BatchStat(I.ones((n,)))
        self.bias = BatchStat(I.zeros((n,)))
        self.running_mean = BatchStat(I.zeros((n,)))
        self.running_var = BatchStat(I.ones((n,)))

    def __call__(self, x):
        scale = self.weight.value * jax.lax.rsqrt(self.running_var.value + 1e-5)
        bias = self.bias.value - self.running_mean.value * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _make_resnet_backbone(depth=50, freeze_bn=True):
    from ..classification.resnet import ResNet

    model = ResNet(depth=depth, num_classes=0, with_pool=False)
    if not freeze_bn:
        return model
    # swap every BatchNorm for a frozen one, preserving topology/paths
    def freeze(obj):
        for name, child in list(vars(obj).items()):
            if isinstance(child, nn.BatchNorm):
                fbn = FrozenBatchNorm(child.running_mean.value.shape[0])
                setattr(obj, name, fbn)
            elif isinstance(child, Module):
                freeze(child)
            elif isinstance(child, (list, tuple)):
                for c in child:
                    if isinstance(c, Module):
                        freeze(c)
    freeze(model)
    return model


def sine_position_embedding(h, w, dim=256, temperature=10000.0):
    """2D sine embeddings [H, W, dim] (reference :1065)."""
    half = dim // 2
    ys = (np.arange(h, dtype=np.float32) + 1.0)[:, None]
    xs = (np.arange(w, dtype=np.float32) + 1.0)[None, :]
    eps = 1e-6
    ys = ys / (h + eps) * 2 * math.pi
    xs = xs / (w + eps) * 2 * math.pi
    dim_t = temperature ** (2 * (np.arange(half // 2)) / half)
    pos_x = xs[..., None] / dim_t
    pos_y = np.broadcast_to(ys[..., None] / dim_t, (h, w, half // 2))
    pos_x = np.broadcast_to(pos_x, (h, w, half // 2))
    emb = np.concatenate([
        np.stack([np.sin(pos_y), np.cos(pos_y)], -1).reshape(h, w, -1),
        np.stack([np.sin(pos_x), np.cos(pos_x)], -1).reshape(h, w, -1),
    ], axis=-1)
    return emb.astype(np.float32)


class DetrAttention(Module):
    """MHA with separate q/k/v projections and additive position embeds."""

    def __init__(self, dim, num_heads, dropout=0.0):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q = nn.Linear(dim, dim, w_init=lambda s: I.xavier_uniform(s))
        self.k = nn.Linear(dim, dim, w_init=lambda s: I.xavier_uniform(s))
        self.v = nn.Linear(dim, dim, w_init=lambda s: I.xavier_uniform(s))
        self.out = nn.Linear(dim, dim, w_init=lambda s: I.xavier_uniform(s))
        self.drop = nn.Dropout(dropout)

    def _split(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, q, k, v, q_pos=None, k_pos=None):
        qq = self.q(q if q_pos is None else q + q_pos)
        kk = self.k(k if k_pos is None else k + k_pos)
        vv = self.v(v)
        out = scaled_dot_product_attention(self._split(qq), self._split(kk),
                                           self._split(vv))
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.drop(self.out(out))


class EncoderLayer(Module):
    def __init__(self, dim=256, heads=8, ffn=2048, dropout=0.1):
        self.attn = DetrAttention(dim, heads, dropout)
        self.norm1 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn)
        self.fc2 = nn.Linear(ffn, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.drop = nn.Dropout(dropout)

    def __call__(self, x, pos):
        x = self.norm1(x + self.attn(x, x, x, q_pos=pos, k_pos=pos))
        y = self.fc2(self.drop(nn.relu(self.fc1(x))))
        return self.norm2(x + self.drop(y))


class DecoderLayer(Module):
    def __init__(self, dim=256, heads=8, ffn=2048, dropout=0.1):
        self.self_attn = DetrAttention(dim, heads, dropout)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn = DetrAttention(dim, heads, dropout)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn)
        self.fc2 = nn.Linear(ffn, dim)
        self.norm3 = nn.LayerNorm(dim)
        self.drop = nn.Dropout(dropout)

    def __call__(self, q, memory, q_pos, mem_pos):
        q = self.norm1(q + self.self_attn(q, q, q, q_pos=q_pos, k_pos=q_pos))
        q = self.norm2(q + self.cross_attn(q, memory, memory, q_pos=q_pos,
                                           k_pos=mem_pos))
        y = self.fc2(self.drop(nn.relu(self.fc1(q))))
        return self.norm3(q + self.drop(y))


class MLP(Module):
    def __init__(self, in_dim, hidden, out_dim, layers=3):
        dims = [in_dim] + [hidden] * (layers - 1) + [out_dim]
        self.layers = [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])]

    def __call__(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = nn.relu(x)
        return x


class Detr(Module):
    def __init__(self, num_classes=91, num_queries=100, dim=256, heads=8,
                 enc_layers=6, dec_layers=6, ffn=2048, dropout=0.1,
                 aux_loss=True, matcher="auto", backbone_depth=50,
                 freeze_bn=True):
        # freeze_bn=True is the reference semantics (:284) and assumes
        # PRETRAINED backbone weights — frozen identity-stat BN gives a
        # from-scratch ResNet no normalization at all (activations drift
        # over 50 layers; the r4 fixture sweep plateaued at mAP .048 with
        # falling loss).  From-scratch training must pass freeze_bn=False.
        self.backbone = _make_resnet_backbone(backbone_depth, freeze_bn)
        c5 = 512 if backbone_depth in (18, 34) else 2048
        self.input_proj = nn.Conv2d(c5, dim, 1)
        self.query_embed = Param(I.normal((num_queries, dim), std=1.0))
        self.encoder = [EncoderLayer(dim, heads, ffn, dropout)
                        for _ in range(enc_layers)]
        self.decoder = [DecoderLayer(dim, heads, ffn, dropout)
                        for _ in range(dec_layers)]
        self.dec_norm = nn.LayerNorm(dim)
        self.class_head = nn.Linear(dim, num_classes + 1)
        self.bbox_head = MLP(dim, dim, 4)
        self.num_classes = num_classes
        self.num_queries = num_queries
        self.dim = dim
        self.aux_loss = aux_loss
        self.loss = DetrLoss(num_classes, matcher=matcher)

    def __call__(self, images):
        feats = self.backbone.features(images)[-1]  # C5 [B, H/32, W/32, 2048]
        x = self.input_proj(feats)
        b, h, w, c = x.shape
        pos = jnp.asarray(sine_position_embedding(h, w, self.dim)).reshape(
            1, h * w, self.dim).astype(x.dtype)
        src = x.reshape(b, h * w, c)
        for layer in self.encoder:
            src = layer(src, pos)
        q_pos = jnp.broadcast_to(self.query_embed.value[None],
                                 (b, self.num_queries, self.dim)).astype(x.dtype)
        q = jnp.zeros_like(q_pos)
        inter = []
        for layer in self.decoder:
            q = layer(q, src, q_pos, pos)
            inter.append(self.dec_norm(q))
        outputs = []
        for feat in inter:
            logits = self.class_head(feat)
            boxes = nn.sigmoid(self.bbox_head(feat))  # normalized cxcywh
            outputs.append({"logits": logits, "boxes": boxes})
        if is_training():
            return outputs if self.aux_loss else [outputs[-1]]
        return outputs[-1]

    def loss_fn(self, outputs, targets):
        if isinstance(outputs, dict):
            outputs = [outputs]
        total = 0.0
        for i, out in enumerate(outputs if self.aux_loss else outputs[-1:]):
            total = total + self.loss(out["logits"], out["boxes"], targets)
        return total

    def predict_boxes(self, output, image_hw):
        """Top-scoring boxes: (labels, scores, xyxy pixels) per query."""
        probs = jax.nn.softmax(output["logits"], -1)[..., :-1]
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        h, w = image_hw
        boxes = xywh2xyxy(output["boxes"]) * jnp.asarray([w, h, w, h],
                                                         jnp.float32)
        return labels, scores, boxes


def _auto_matcher_mode(platforms=None):
    """"callback" wherever host callbacks work, "auction" on the axon
    relay.  The relay registers its PJRT plugin under the "tpu"
    platform name (default_backend() == "tpu", device_kind "TPU v5
    lite") yet implements no host send/recv, so the only reliable
    marker is the platform LIST jax was configured with ("axon,cpu")."""
    if platforms is None:
        platforms = str(getattr(jax.config, "jax_platforms", "") or "")
    return "auction" if "axon" in platforms else "callback"


class DetrLoss(Module):
    """Hungarian-matched CE + L1 + GIoU (reference DetrLoss :1232)."""

    def __init__(self, num_classes, eos_coef=0.1, cost_class=1.0,
                 cost_bbox=5.0, cost_giou=2.0, w_class=1.0, w_bbox=5.0,
                 w_giou=2.0, matcher="auto"):
        self.num_classes = num_classes
        self.eos_coef = eos_coef
        self.costs = (cost_class, cost_bbox, cost_giou)
        self.weights = (w_class, w_bbox, w_giou)
        self.matcher = matcher

    def _match(self, cost):
        """[B, M, Q] cost -> [B, M] column assignment.

        ``matcher="callback"`` is the exact scipy Hungarian via
        ``jax.pure_callback``; ``"auction"`` is the on-device
        epsilon-optimal auction (ops/hungarian.py).  ``"auto"`` picks
        the callback wherever the runtime supports host callbacks and
        falls back to the auction on the axon TPU relay, whose PJRT
        client implements no host send/recv (UNIMPLEMENTED at run
        time — r4 sweep finding)."""
        mode = self.matcher
        if mode == "auto":
            mode = _auto_matcher_mode()
        if mode == "callback":
            return hungarian_callback(cost)
        # rows the auction's iteration budget leaves unassigned come back
        # as -1; the loss masks them out alongside padded rows (clamping
        # them to a real column would scatter TWO gts into one query and
        # train it toward an arbitrary target)
        return jax.vmap(lambda c: auction_assign(c, num_iters=200))(cost)

    def __call__(self, logits, pred_boxes, targets):
        """targets: boxes [B, M, 4] normalized cxcywh, class_labels [B, M],
        mask [B, M] (1 = real)."""
        gt_boxes = targets["boxes"]
        gt_labels = targets["class_labels"].astype(jnp.int32)
        mask = targets.get("mask")
        if mask is None:
            mask = (gt_boxes[..., 2] > 0).astype(jnp.float32)
        b, q = logits.shape[:2]
        m = gt_boxes.shape[1]
        cc, cb, cg = self.costs

        prob = jax.nn.softmax(logits, -1)                       # [B, Q, C+1]
        cost_class = -jnp.take_along_axis(
            prob, gt_labels[:, None, :].repeat(q, 1), axis=-1)  # [B, Q, M]
        cost_bbox = jnp.abs(pred_boxes[:, :, None, :] -
                            gt_boxes[:, None, :, :]).sum(-1)
        pxyxy = xywh2xyxy(pred_boxes)
        gxyxy = xywh2xyxy(gt_boxes)
        cost_giou = -aligned_iou(pxyxy[:, :, None, :], gxyxy[:, None, :, :],
                                 mode="giou")
        cost = cc * cost_class + cb * cost_bbox + cg * cost_giou
        cost = jnp.where(mask[:, None, :] > 0, cost, 1e6)
        cost = jnp.transpose(cost, (0, 2, 1))                   # [B, M, Q]
        assign = self._match(jax.lax.stop_gradient(cost))  # [B, M]

        # classification: assigned queries get gt class, rest no-object.
        # valid = real gt AND actually matched (the auction matcher may
        # return -1 on iteration-budget exhaustion — such rows get no
        # supervision this step; negative indices would WRAP in scatter
        # even with mode="drop", so they are routed to the q sentinel)
        valid = (mask > 0) & (assign >= 0)
        bidx = jnp.arange(b)[:, None]
        tgt_class = jnp.full((b, q), self.num_classes, jnp.int32)
        safe_assign = jnp.where(valid, assign, q)
        tgt_class = tgt_class.at[bidx, safe_assign].set(gt_labels, mode="drop")
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.take_along_axis(logp, tgt_class[..., None], -1)[..., 0]
        cls_w = jnp.where(tgt_class == self.num_classes, self.eos_coef, 1.0)
        loss_ce = (ce * cls_w).sum() / cls_w.sum()

        # box losses on matched pairs
        vmask = valid.astype(gt_boxes.dtype)
        matched_pred = pred_boxes[bidx, safe_assign.clip(0, q - 1)]  # [B, M, 4]
        num_boxes = jnp.maximum(mask.sum(), 1.0)
        l1 = (jnp.abs(matched_pred - gt_boxes).sum(-1) * vmask).sum() / num_boxes
        giou = ((1.0 - aligned_iou(xywh2xyxy(matched_pred), gxyxy,
                                   mode="giou")) * vmask).sum() / num_boxes
        wc, wb, wg = self.weights
        return wc * loss_ce + wb * l1 + wg * giou


def detr_resnet50(num_classes=91, **kw):
    return Detr(num_classes=num_classes, **kw)
