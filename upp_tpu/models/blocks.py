"""Multi-path prompted transformer blocks — the heart of UPP.

Re-implements the reference ``Block`` (``models/Point_MAE_pretask_dev.py:199-321``)
and its encoder/decoder stacks (``:324-384``): a standard pre-LN ViT block
extended with three *path-conditional* prompt token sets (rectify / pretask /
downstream), path-conditional bottleneck adapters applied after the prompts
are stripped, and geometry-aware "prompt propagation" that re-diffuses token
features across a precomputed 2-level FPS hierarchy.

Deviations from the reference (deliberate, see SURVEY.md §2.7):

* The reference's propagation gather indexes the *prompt-prefixed* token
  matrix with indices computed for the prompt-free cloud
  (``Point_MAE_pretask_dev.py:288-292``), scrambling rows across batch
  elements when ``gather_idx=False``. We implement the intended semantics:
  gather from the group tokens only.
* The undefined ``pooling`` function (``Point_MAE_unify.py`` has no such
  symbol; called at ``Point_MAE_pretask_dev.py:294``) is defined here as
  max-pooling over the neighbourhood axis of BatchNorm-transformed features —
  the PointNet-style reduction the surrounding code implies.

Paths are selected by *static* Python strings, so each of the three backbone
passes traces to its own fully-fused XLA program — no runtime branching.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.propagate import inverse_distance_interp
from .layers import Adapter, Attention, DropPath, Mlp, trunc_normal_init

xavier_uniform_init = nn.initializers.xavier_uniform()


@dataclasses.dataclass(frozen=True)
class PrompterConfig:
    """Static prompt/adapter layout per path (cfg ``prompter_config`` node,
    e.g. ``cfgs/unify_modelnet_cls.yaml:48-64``)."""
    rectify_adapter: bool = False
    rectify_prompts: bool = False
    rectify_prompts_num: int = 0
    rectify_prompts_depth: int = 0
    rectify_depth: int = 0
    pretask_adapter: bool = False
    pretask_prompts: bool = False
    pretask_prompts_num: int = 0
    pretask_prompts_depth: int = 0
    pretask_depth: int = 0
    downstream_adapter: bool = False
    downstream_prompts: bool = False
    downstream_prompts_num: int = 0
    downstream_prompts_depth: int = 0
    downstream_depth: int = 0

    @classmethod
    def from_cfg(cls, cfg: Optional[Dict[str, Any]]) -> "PrompterConfig":
        if cfg is None:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in dict(cfg).items() if k in fields})


class PromptedBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    block_idx: int = 0
    prompter: PrompterConfig = PrompterConfig()

    def _has_prompts(self, path: str) -> bool:
        p, i = self.prompter, self.block_idx
        return {
            "rectify": p.rectify_prompts and i < p.rectify_prompts_depth,
            "pretask": p.pretask_prompts and i < p.pretask_prompts_depth,
            "downstream": p.downstream_prompts and i < p.downstream_prompts_depth,
        }.get(path, False)

    def _has_adapter(self, path: str) -> bool:
        p, i = self.prompter, self.block_idx
        return {
            "rectify": p.rectify_adapter and i < p.rectify_depth,
            "pretask": p.pretask_adapter and i < p.pretask_depth,
            "downstream": p.downstream_adapter,   # adapters in ALL blocks
        }.get(path, False)

    @nn.compact
    def __call__(self, x, *, path: str, classification: bool = False,
                 propagation: Optional[Dict[str, jnp.ndarray]] = None,
                 deterministic: bool = True):
        """One prompted block.

        Args:
          x: [B, T, C] tokens (pos already added by the stack).
          path: 'rectify' | 'pretask' | 'downstream' | 'none' (plain ViT).
          classification: True when token 0 is a cls token (prompts are
            inserted after it).
          propagation: dict with center1 [B,G,3], center1_idx [B,G2,k],
            center2 [B,G2,3], center2_idx [B,G2] enabling prompt propagation.
        """
        p = self.prompter
        use_prompts = self._has_prompts(path)
        num_prompts = {"rectify": p.rectify_prompts_num,
                       "pretask": p.pretask_prompts_num,
                       "downstream": p.downstream_prompts_num}.get(path, 0)

        drop_path = DropPath(self.drop_path)

        if use_prompts:
            prompts = self.param(f"{path}_prompts", xavier_uniform_init,
                                 (num_prompts, self.dim))
            ptok = jnp.broadcast_to(prompts[None], (x.shape[0],) + prompts.shape)
            if classification:
                x = jnp.concatenate([x[:, :1], ptok, x[:, 1:]], axis=1)
            else:
                x = jnp.concatenate([ptok, x], axis=1)

        # pre-LN attention + MLP with stochastic depth
        x = x + drop_path(
            Attention(self.dim, self.num_heads, attn_drop=self.attn_drop,
                      proj_drop=self.drop, name="attn")(
                nn.LayerNorm(name="norm1")(x), deterministic=deterministic),
            deterministic=deterministic)
        x = x + drop_path(
            Mlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                name="mlp")(nn.LayerNorm(name="norm2")(x),
                            deterministic=deterministic),
            deterministic=deterministic)

        # geometry-aware prompt propagation (Point_MAE_pretask_dev.py:275-303)
        if use_prompts and propagation is not None:
            B = x.shape[0]
            cls_x = x[:, :1] if classification else None
            body = x[:, 1:] if classification else x
            g = propagation["center1"].shape[1]
            tokens = body[:, -g:]                       # group tokens [B, G, C]
            prefix = body[:, :-g]                       # prompt tokens
            n_idx = propagation["center1_idx"]          # [B, G2, k] → level-1 ids
            c_idx = propagation["center2_idx"]          # [B, G2]
            g2, k = n_idx.shape[1], n_idx.shape[2]
            neigh = jnp.take_along_axis(
                tokens, n_idx.reshape(B, -1)[..., None], axis=1
            ).reshape(B, g2, k, self.dim)
            centers = jnp.take_along_axis(tokens, c_idx[..., None], axis=1)
            # reference quirk kept: droppath(x)+x doubles features at eval
            # (Point_MAE_pretask_dev.py:293)
            neigh = drop_path(neigh, deterministic=deterministic) + neigh
            pooled = self._pooling(neigh, deterministic)          # [B, G2, C]
            centers = pooled + 0.3 * centers
            tokens = tokens + 0.3 * inverse_distance_interp(
                propagation["center1"], propagation["center2"], centers,
                k=8, eps=1e-3)
            parts = ([cls_x] if classification else []) + [prefix, tokens]
            x = jnp.concatenate(parts, axis=1)

        # strip prompt tokens (Point_MAE_pretask_dev.py:305-310)
        if use_prompts:
            if classification:
                x = jnp.concatenate([x[:, :1], x[:, num_prompts + 1:]], axis=1)
            else:
                x = x[:, num_prompts:]

        # post-MLP path adapter (Point_MAE_pretask_dev.py:312-320)
        if self._has_adapter(path):
            x = x + Adapter(self.dim, reduction_dims=32, drop_rate=0.1,
                            name=f"{path}_adapter")(x, deterministic=deterministic)
        return x

    def _pooling(self, neigh: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        """max over the neighbourhood axis of BatchNorm-normalised features
        (our definition of the reference's missing ``pooling``; the BatchNorm
        is the Block's ``bnorm`` parameter, which the PEFT recipe marks
        trainable — ``tools/runner_module.py:62-66``)."""
        B, g2, k, C = neigh.shape
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="bnorm")(neigh.reshape(B, g2 * k, C))
        return jnp.max(y.reshape(B, g2, k, C), axis=2)


class TransformerEncoderStack(nn.Module):
    """Depth-truncating encoder (``Point_MAE_pretask_dev.py:324-349``):
    rectify runs blocks [0, rectify_depth), pretask [0, pretask_depth),
    downstream all of them. ``feature_blocks`` (call-time) additionally
    returns the intermediate features after those block indices (segmentation
    taps {3, 7, 11}, ``Point_MAE_unify_segment.py:202-236``)."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    prompter: PrompterConfig = PrompterConfig()

    @nn.compact
    def __call__(self, x, pos, *, path: str, classification: bool = False,
                 propagation=None, deterministic: bool = True,
                 feature_blocks: tuple = ()):
        p = self.prompter
        run_depth = {"rectify": p.rectify_depth or self.depth,
                     "pretask": p.pretask_depth or self.depth}.get(path, self.depth)
        if self.is_initializing():
            # materialise every block's params even when this pass truncates
            # (the reference creates all `depth` blocks up front; checkpoints
            # carry the full frozen backbone).
            run_depth = self.depth
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        feats = []
        for i in range(self.depth):
            if i == run_depth:
                break
            x = PromptedBlock(self.embed_dim, self.num_heads, drop_path=dpr[i],
                              block_idx=i, prompter=p, name=f"block{i}")(
                x + pos, path=path, classification=classification,
                propagation=propagation, deterministic=deterministic)
            if i in feature_blocks:
                feats.append(x)
        if feature_blocks:
            return x, feats
        return x


class TransformerDecoderStack(nn.Module):
    """4-block MAE decoder over [x_vis ‖ mask tokens], returning the last
    ``return_token_num`` tokens (``Point_MAE_pretask_dev.py:352-384``).
    Created with pretask adapters in every block."""
    embed_dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, pos, return_token_num: int, *, deterministic: bool = True):
        prompter = PrompterConfig(pretask_adapter=True, pretask_depth=self.depth)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        for i in range(self.depth):
            x = PromptedBlock(self.embed_dim, self.num_heads, drop_path=dpr[i],
                              block_idx=i, prompter=prompter, name=f"block{i}")(
                x + pos, path="pretask", deterministic=deterministic)
        x = nn.LayerNorm(name="norm")(x[:, -return_token_num:])
        return x
