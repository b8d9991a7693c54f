"""Pretrain model + MoCo momentum-contrast engine
(reference: BirdPreTrainedModel, modeling.py:88-436).

TPU-native design notes
-----------------------

- **Momentum (key) towers are a params tree, not modules.** The reference
  instantiates duplicate ``*_k`` submodules and EMA-copies parameters in a
  Python loop (modeling.py:110-135, 238-242). Here the key side is a second
  params pytree with subtrees {text_encoder, visual_encoder, t_projector,
  v_projector}; the EMA update is one fused ``tree_map`` inside the jitted
  train step, and key forwards re-apply the SAME module definitions with the
  key tree. No duplicated module code, exact same semantics.
- **Queues are functional state** (:class:`MoCoQueues`): replicated arrays
  carried through the train step and updated with
  ``lax.dynamic_update_slice`` after the (implicit, sharded) global key
  gather — the reference's explicit ``dist_collect`` + buffer write
  (modeling.py:244-284). The pointer contract is the reference's:
  ``K % global_batch == 0``.
- **MLM masking** is jitted RNG ops reproducing the 80/10/10 split and its
  quirks (modeling.py:181-205): positions equal to ``pad_token_id`` and
  ``cls_token_id`` are protected — note the reference's english pad id is
  the EOT id (49407) while actual padding is 0, so zero-padding positions
  remain maskable; reproduced for checkpoint parity.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models.heads import MLMHead, ProjectorMLP
from hmmc_tpu.models.text import TextEncoder
from hmmc_tpu.models.visual import VisualEncoder

Dtype = Any

# subtrees of `params` that have momentum twins (modeling.py:131-135)
MOMENTUM_SUBTREES = (
    "text_encoder", "visual_encoder", "t_projector", "v_projector")


class BirdPretrainModel(nn.Module):
    """Query-side towers + projectors + MLM head.

    Reference ctor: modeling.py:88-157. The ``*_k`` towers are NOT module
    members — see module docstring.
    """

    arch: ClipArch
    cross_config: CrossConfig = CrossConfig()
    language: str = "english"
    use_temp: bool = True
    vocab_size: int = 49408          # tokenizer vocab (MLM head width)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: Any = False  # False | True (full) | "dots" (selective)
    chinese_vocab_size: int = 21128

    def setup(self):
        cc = self.cross_config
        # Feature width of every tower output (modeling.py hard-codes 512
        # in its MLP heads, which equals embed_dim only for the ViT-B
        # towers; deriving it from the arch keeps RN50/L14 working).
        h = self.arch.embed_dim
        self.text_encoder = TextEncoder(
            self.arch, cc, language=self.language, dtype=self.dtype,
            param_dtype=self.param_dtype, use_pallas=self.use_pallas,
            chinese_vocab_size=self.chinese_vocab_size)
        self.visual_encoder = VisualEncoder(
            self.arch, cc, use_temp=self.use_temp, dtype=self.dtype,
            param_dtype=self.param_dtype, use_pallas=self.use_pallas,
            remat=self.remat)
        # projector/predictor MLPs (modeling.py:114-130); 4096 inner width
        self.t_projector = ProjectorMLP(
            num_layers=cc.proj_num_layers, in_dim=h, out_dim=h,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.v_projector = ProjectorMLP(
            num_layers=cc.proj_num_layers, in_dim=h, out_dim=h,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.v_predictor = ProjectorMLP(
            num_layers=cc.pred_num_layers, in_dim=h, out_dim=h,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.cls = MLMHead(
            vocab_size=self.vocab_size, dtype=self.dtype,
            param_dtype=self.param_dtype)

    # ---- tower methods (each usable standalone via apply(method=...)) ----

    def encode_text(self, input_ids, attention_mask=None,
                    return_hidden: bool = False):
        return self.text_encoder(input_ids, attention_mask,
                                 return_hidden=return_hidden)

    def encode_video(self, video, frame_mask=None):
        return self.visual_encoder(video, frame_mask)

    def project_frames(self, frame_fea: jnp.ndarray, train: bool = True
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """v_projector + v_predictor over flattened frames
        (modeling.py:354-360). frame_fea: [B, F, H]."""
        b, f, h = frame_fea.shape
        flat = frame_fea.reshape(b * f, h)
        proj = self.v_projector(flat, train=train)
        pred = self.v_predictor(proj, train=train)
        return proj.reshape(b, f, -1), pred.reshape(b, f, -1)

    def project_frames_key(self, frame_fea: jnp.ndarray, train: bool = True
                           ) -> jnp.ndarray:
        """Key-side projector only (no predictor) — applied with the key
        params tree (modeling.py:375-378)."""
        b, f, h = frame_fea.shape
        proj = self.v_projector(frame_fea.reshape(b * f, h), train=train)
        return proj.reshape(b, f, -1)

    def mlm_logits(self, input_ids, attention_mask) -> jnp.ndarray:
        hidden = self.text_encoder(input_ids, attention_mask,
                                   return_hidden=True)
        return self.cls(hidden)

    def logit_scale(self) -> jnp.ndarray:
        scale = self.text_encoder.variables["params"]["logit_scale"]
        return jnp.minimum(jnp.exp(jax.lax.stop_gradient(scale)), 100.0)

    def project_text(self, text_fea: jnp.ndarray, train: bool = True
                     ) -> jnp.ndarray:
        """t_projector. NOTE: constructed and momentum-paired by the
        reference (modeling.py:113-116,134) but never invoked in any forward
        — kept for checkpoint parity; the optimizer freezes it (matching the
        de-facto never-updated torch behavior where unused params get no
        grad under find_unused_parameters=True)."""
        return self.t_projector(text_fea, train=train)

    def __call__(self, title_ids, title_mask, video, train: bool = True):
        """Init/trace path touching every submodule."""
        title_fea = self.encode_text(title_ids, title_mask)
        v_fea, frame_fea = self.encode_video(video)
        frame_proj, frame_pred = self.project_frames(frame_fea, train=train)
        _ = self.project_text(title_fea, train=train)
        mlm = self.mlm_logits(title_ids, title_mask)
        return title_fea, v_fea, frame_fea, frame_proj, frame_pred, mlm


# ---------------------------------------------------------------------------
# momentum params
# ---------------------------------------------------------------------------

def init_key_params(params: dict) -> dict:
    """Key tree = fresh copy of the query towers (copy_params,
    modeling.py:231-236). Real copies, not aliases — the train step donates
    its input buffers, and an aliased leaf would be donated twice."""
    return {k: jax.tree_util.tree_map(jnp.copy, params[k])
            for k in MOMENTUM_SUBTREES}


def momentum_update(params: dict, params_k: dict, momentum: float) -> dict:
    """k <- m*k + (1-m)*q, one fused tree_map (modeling.py:238-242)."""
    return jax.tree_util.tree_map(
        lambda k, q: k * momentum + q.astype(k.dtype) * (1.0 - momentum),
        params_k, {t: params[t] for t in MOMENTUM_SUBTREES})


# ---------------------------------------------------------------------------
# negative queues
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class MoCoQueues:
    """Replicated negative queues, column-layout [hidden, K] like the
    reference buffers (modeling.py:137-151)."""

    v_cross: jnp.ndarray          # [H, K]
    frame_proj: jnp.ndarray       # [H, K*F]
    frame_cross: jnp.ndarray      # [H, K*F]
    title_cross: jnp.ndarray      # [H, K]
    tag_cross: jnp.ndarray        # [H, K]
    ptr: jnp.ndarray              # scalar int32

    @classmethod
    def create(cls, rng: jax.Array, hidden: int, num_negative: int,
               max_frames: int) -> "MoCoQueues":
        """Random unit-norm init (modeling.py:139-151)."""
        keys = jax.random.split(rng, 5)

        def q(key, cols):
            x = jax.random.normal(key, (hidden, cols), jnp.float32)
            return x / jnp.linalg.norm(x, axis=0, keepdims=True)

        k, f = num_negative, num_negative * max_frames
        return cls(
            v_cross=q(keys[0], k), frame_proj=q(keys[1], f),
            frame_cross=q(keys[2], f), title_cross=q(keys[3], k),
            tag_cross=q(keys[4], k), ptr=jnp.zeros((), jnp.int32))

    def enqueue(self, v_k: jnp.ndarray, tag_k: jnp.ndarray,
                title_k: jnp.ndarray, frame_k: jnp.ndarray,
                frame_proj_k: jnp.ndarray) -> "MoCoQueues":
        """Insert GLOBAL-batch keys at ptr (modeling.py:244-284).

        v_k/tag_k/title_k: [B, H]; frame_k/frame_proj_k: [B, F, H]. Requires
        K % B == 0 (reference pointer contract). Keys are L2-normalized
        here, exactly like the reference's pre-enqueue normalize.
        """
        def norm(x):
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

        b = v_k.shape[0]
        f = frame_k.shape[1]
        k = self.v_cross.shape[1]
        ptr = self.ptr

        def put(queue, keys_bh):
            return jax.lax.dynamic_update_slice(
                queue, norm(keys_bh).astype(queue.dtype).T, (0, ptr))

        def put_frames(queue, keys_bfh):
            flat = norm(keys_bfh).reshape(b * f, -1)
            return jax.lax.dynamic_update_slice(
                queue, flat.astype(queue.dtype).T, (0, ptr * f))

        new_ptr = ((ptr + b) % k).astype(jnp.int32)
        return self.replace(
            v_cross=put(self.v_cross, v_k),
            tag_cross=put(self.tag_cross, tag_k),
            title_cross=put(self.title_cross, title_k),
            frame_proj=put_frames(self.frame_proj, frame_proj_k),
            frame_cross=put_frames(self.frame_cross, frame_k),
            ptr=new_ptr)


# ---------------------------------------------------------------------------
# MLM masking (modeling.py:160-205)
# ---------------------------------------------------------------------------

def mask_tokens(
    rng: jax.Array,
    input_ids: jnp.ndarray,
    vocab_size: int,
    mask_token_id: int,
    pad_token_id: int,
    cls_token_id: int,
    mlm_probability: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_ids, labels); labels = -100 on unmasked positions.

    80% -> [MASK]; 10% -> uniform random token; 10% -> unchanged, with the
    reference's exact split construction (bernoulli(0.8), then
    bernoulli(0.5) on the remainder, modeling.py:192-199).
    """
    r_sel, r_rep, r_rand, r_words = jax.random.split(rng, 4)
    shape = input_ids.shape
    masked = jax.random.bernoulli(r_sel, mlm_probability, shape)
    masked &= (input_ids != pad_token_id) & (input_ids != cls_token_id)
    labels = jnp.where(masked, input_ids, -100)

    replaced = jax.random.bernoulli(r_rep, 0.8, shape) & masked
    randomized = (jax.random.bernoulli(r_rand, 0.5, shape)
                  & masked & ~replaced)
    random_words = jax.random.randint(r_words, shape, 0, vocab_size,
                                      dtype=input_ids.dtype)
    out = jnp.where(replaced, mask_token_id, input_ids)
    out = jnp.where(randomized, random_words, out)
    return out, labels


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy ignoring -100 labels (modeling.py:173-180)."""
    vocab = logits.shape[-1]
    logits = logits.reshape(-1, vocab).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logpt = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logpt, safe[:, None], axis=-1)[:, 0]
    picked = jnp.where(valid, picked, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(picked) / count
