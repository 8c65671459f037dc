"""Typed configuration for the whole framework.

The reference scatters configuration across constructor kwargs, one literal dict
(`main.py:85-110`), and hard-coded per-machine paths (SURVEY.md §5.6).  Here every
tunable lives in one typed, serialisable tree of dataclasses.  The shipped-parity
values mirror the reference's `pretrained_model.py:17-42` construction.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class PreprocessConfig:
    """Canonical CT preprocessing operator parameters.

    The reference hard-codes two inconsistent windowings (train: clip +-1000 HU
    then /1000 at data.py:150-152; inference: clip [-1000, 200] then (x+400)/600
    at data_inference.py:82-85).  Both are expressible here; the asymmetry is
    preserved deliberately because eval parity depends on it (SURVEY.md §7).
    """

    # HU windowing
    hu_min: float = -1000.0
    hu_max: float = 1000.0
    hu_shift: float = 0.0       # value added after clip
    hu_scale: float = 1000.0    # value divided by after shift
    # target voxel spacing (z, y, x) in mm — reference preprocess_train.py:104-109
    target_spacing: tuple[float, float, float] = (1.5, 0.75, 0.75)
    # fixed output grid (depth, height, width) — reference data.py:154-190
    target_shape: tuple[int, int, int] = (240, 480, 480)
    pad_value: float = -1.0     # reference data.py:178-189

    @staticmethod
    def train() -> "PreprocessConfig":
        """clip(+-1000)/1000 — parity with ct_clip/data.py:150-152."""
        return PreprocessConfig(hu_min=-1000.0, hu_max=1000.0, hu_shift=0.0, hu_scale=1000.0)

    @staticmethod
    def inference() -> "PreprocessConfig":
        """clip([-1000,200]); (x+400)/600 — parity with data_inference.py:82-85."""
        return PreprocessConfig(hu_min=-1000.0, hu_max=200.0, hu_shift=400.0, hu_scale=600.0)


@dataclass(frozen=True)
class CTViTConfig:
    """3D vision tower. Parity values from reference pretrained_model.py:17-27."""

    dim: int = 512
    codebook_size: int = 8192
    image_size: int = 480           # spatial H = W
    patch_size: int = 20            # spatial patch
    temporal_size: int = 240        # number of axial slices (depth)
    temporal_patch_size: int = 10
    spatial_depth: int = 4
    temporal_depth: int = 4
    dim_head: int = 32
    heads: int = 8
    channels: int = 1
    ff_mult: int = 4
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    use_vq: bool = True             # vector-quantized bottleneck (ctvit.py:187)
    # Reproduce the reference PEG's temporal-fold layout scramble
    # (attention.py:56-84 reshapes the (b*h*w, t, d) fold straight to
    # (b, t, h, w, d), row-major mismatch).  ctpa's default (False) transposes
    # correctly — the right behavior for training from scratch — but
    # CT-CLIP_v2.pt was TRAINED with the scramble, so imported reference
    # checkpoints only reproduce reference activations with this True
    # (build_ctclip auto-sets it when loading a torch .pt checkpoint).
    peg_reference_layout: bool = False
    # True projects self-attention K/V from the LayerNormed tokens.  Default
    # False matches the reference quirk (attention.py:136-143, K/V from the
    # UN-normalized input) — set True only to reproduce ctpa checkpoints
    # trained before the round-3 parity fix, which normalized both.
    attn_kv_from_normed: bool = False
    vq_decay: float = 0.99          # EMA codebook decay
    vq_commitment_weight: float = 1.0
    # fused full-sequence attention over all t*h*w tokens via the pallas flash
    # kernel — the TPU-native long-context alternative to axial factorization
    # (new capability, SURVEY.md §5.7); parity path is fused_attention=False
    fused_attention: bool = False
    fused_depth: int = 4
    # route the axial SPATIAL fold's attention through the pallas flash
    # kernel too (cosine flat-softmax path; CPB bias supported) — measured
    # faster than the XLA attention at the 576-token fold (docs/benchmarks.md
    # round 3); TPU only, same math as the XLA path
    flash_axial: bool = False
    # pallas fused patchify+LN+projection kernel (2x the XLA patch embed at
    # shipped scale; TPU only — tests on CPU keep the XLA path)
    pallas_patchify: bool = False
    # decoder / GAN head (generative capability parity; off for CLIP training)
    use_decoder: bool = False

    @property
    def spatial_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2  # 24*24 = 576

    @property
    def temporal_tokens(self) -> int:
        return self.temporal_size // self.temporal_patch_size  # 24

    @property
    def patch_dim(self) -> int:
        return self.channels * self.temporal_patch_size * self.patch_size * self.patch_size

    @staticmethod
    def tiny() -> "CTViTConfig":
        """Small config for tests / CPU smoke (32^3-ish volumes)."""
        return CTViTConfig(
            dim=64, codebook_size=64, image_size=32, patch_size=8,
            temporal_size=16, temporal_patch_size=4, spatial_depth=1,
            temporal_depth=1, dim_head=16, heads=4,
        )


@dataclass(frozen=True)
class BertConfig:
    """Text tower. Defaults match microsoft/BiomedVLP-CXR-BERT-specialized
    (BERT-base geometry; reference pretrained_model.py:7-9)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.0
    pad_token_id: int = 0

    @staticmethod
    def tiny() -> "BertConfig":
        return BertConfig(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                          intermediate_size=128, max_position_embeddings=128)


@dataclass(frozen=True)
class CTCLIPConfig:
    """Dual-encoder CLIP. Parity values from reference pretrained_model.py:31-42."""

    dim_latent: int = 512
    dim_text: int = 768
    dim_image: int = 294912         # 24*24*512 after temporal mean-pool + flatten
    temperature_init: float = 1.0   # ct_clip.py:568 — nn.Parameter(tensor(1.))
    decoupled_contrastive_learning: bool = False
    extra_latent_projection: bool = False   # CLOOB-style (ct_clip.py:577-581)
    downsample_image_embeds: bool = False   # conv3d downsample before the
                                            # latent projection (ct_clip.py:553-562)
    use_all_token_embeds: bool = False      # FILIP (ct_clip.py:829-843)
    use_mlm: bool = False
    text_ssl_loss_weight: float = 0.05
    image_ssl_loss_weight: float = 0.05
    multiview_loss_weight: float = 0.1   # weight on augmented-view InfoNCE
                                         # (ct_clip.py:649-675, 890-899)
    # Global-batch negatives: all-gather latents over the mesh 'data' axis.
    # (New capability — the reference computes loss on local batch only, §2.4.)
    gather_negatives: bool = True

    @staticmethod
    def tiny(vit: CTViTConfig, bert: BertConfig) -> "CTCLIPConfig":
        s = vit.image_size // vit.patch_size
        return CTCLIPConfig(dim_latent=32, dim_text=bert.hidden_size,
                            dim_image=s * s * vit.dim)


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA overlay on attention projections (reference vqa_meditron.py:432-437,
    train_module.py:330-336)."""

    rank: int = 16
    alpha: float = 32.0
    dropout: float = 0.0
    target_projections: tuple[str, ...] = ("q_proj", "v_proj", "k_proj", "o_proj")


@dataclass(frozen=True)
class LLMConfig:
    """Decoder-only LLM (Meditron-7B is llama-2 geometry; reference
    vqa_meditron.py:425-426)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_embeddings: bool = False
    # route no-cache forwards (training / long prefill) of at least
    # flash_min_len tokens through the pallas flash kernel: measured 2.7x XLA
    # at 2048 tokens x head_dim 128 on v5e (docs/benchmarks.md); fully
    # differentiable (custom-VJP pallas backward). TPU only — keep False on
    # CPU test paths unless running interpreted
    flash_prefill: bool = False
    flash_min_len: int = 512
    # weight-only int8 serving quantization (ops/quant.py): projections store
    # {kernel_q: int8, scale: f32} (see quant.quantize_tree) and decode reads
    # half the HBM bytes per step — decode is weight-read bound at 7B.
    # Incompatible with LoRA overlays (merge adapters before quantizing).
    weight_quant: Optional[str] = None   # None | "int8"
    quant_impl: str = "pallas"           # "pallas" | "xla"
    # fuse q/k/v -> qkv_proj and gate/up -> gateup_proj in the quantized
    # model (pallas launch count per decode step: 7 -> 4 per layer); exact
    # because scales are per-output-channel.  quantize_tree(fuse=...) must
    # match this flag.
    quant_fused: bool = True
    # run the whole SwiGLU FFN as ONE pallas launch (ops/quant.int8_ffn):
    # gate/up/silu*mul/down fused, the (m, intermediate) activation never
    # leaves VMEM, launch count per layer drops 4 -> 3.  Requires
    # quantize_tree(..., ffn_kernel=True) (gate/up/down quantized separately,
    # no gateup concat).
    quant_ffn_kernel: bool = False
    # w8a8: ALSO quantize activations (dynamic symmetric per-token absmax,
    # ops/quant.quantize_act_int8) so the int8 projections run native
    # int8×int8→int32 MXU contractions instead of per-weight-element VPU
    # dequant — the weight-only kernel's binder at large decode batch.
    # Serving-time flag only; weight storage / quantize_tree are unchanged.
    quant_act: bool = False
    # Quantized KV cache: rows are quantized at write time and the scales
    # fold exactly into the attention einsums — cuts the per-step KV read
    # (the dominant HBM traffic at long serving contexts) and multiplies
    # lane capacity per chip.
    #   "int8": symmetric absmax per (token, kv-head) over head_dim; 2x.
    #   "int4": nibble-packed pairs with symmetric absmax per contiguous
    #           kv_quant_group elements of head_dim (ops/quant.
    #           quantize_kv_int4) — ~3.3x at group 32 incl. scales; group
    #           (not whole-head) scales keep the 15-level grid usable.
    kv_quant: Optional[str] = None       # None | "int8" | "int4"
    # head_dim elements sharing one int4 scale (rounded down to a divisor)
    kv_quant_group: int = 32
    # storage dtype of the int4 group scales: "float32" (default) or
    # "bfloat16" — bf16 halves the scale bytes (hd=128/group=32 K row:
    # 80 -> 72 B, 1.83x vs the int8 cache's 132) at ~0.4% extra grid
    # rounding; the fold identity stays exact because quantize_kv_int4
    # rounds the scale FIRST and quantizes nibbles against the rounded
    # value.  int8 KV scales stay f32 (one scalar per row, 3% of bytes).
    kv_scale_dtype: str = "float32"
    # with kv_quant='int8': run the decode attention contractions as native
    # int8 x int8 -> int32 MXU dots — q rows and (v-scale-folded) attention
    # weights are dynamically quantized per row, and the int8 cache feeds
    # the dots DIRECTLY, never materializing bf16 K/V copies (the suspected
    # per-layer convert copies at serving-length contexts,
    # docs/ROUND3_NOTES.md KV-layout experiment).  Adds ~0.4%-scale dynamic
    # quantization noise on q and the attention weights (same regime as the
    # int8 cache rows themselves).
    kv_int8_dots: bool = False
    # fused single-token decode attention (ops/pallas/decode_attention.py):
    # one pallas launch per layer reads each K/V cache byte exactly once
    # (int8 scales folded in-kernel, GQA repeat in-kernel) instead of the
    # XLA einsum chain.  TPU only — keep False on CPU test paths unless
    # running interpreted.
    flash_decode: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny() -> "LLMConfig":
        return LLMConfig(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                         num_kv_heads=2, intermediate_size=128, max_seq_len=256)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axis convention. data=DP, model=TP (SURVEY.md §5.8)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1     # -1: use all remaining devices
    model_parallel: int = 1


@dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer factory parity (reference optimizer.py:3-34 + trainers)."""

    name: str = "adamw"             # 'adam' (wd=0) or 'adamw'
    lr: float = 1.25e-6             # CTCLIPTrainer.py default
    weight_decay: float = 1e-2      # applied only to params with ndim >= 2
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    grad_clip_norm: float = 0.5     # CTCLIPTrainer.py:347
    schedule: str = "constant"      # constant | cosine_warmup_restarts | onecycle
    warmup_steps: int = 10000
    total_steps: int = 100001
    min_lr_ratio: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    num_train_steps: int = 100001
    save_model_every: int = 2000
    save_results_every: int = 2000
    seed: int = 42
    precision: str = "bf16"         # activations/compute dtype; params fp32
    remat: bool = True              # jax.checkpoint on transformer blocks
    results_dir: str = "results"
    checkpoint_dir: str = "checkpoints"


@dataclass(frozen=True)
class ReportGenConfig:
    """Report-generation / VQA head (reference train_module.py + model_components.py)."""

    vision_dim: int = 512
    max_new_tokens: int = 512
    temperature: float = 0.7        # model_components.py:249
    max_prompt_len: int = 128
    llm_lr: float = 2e-5            # train_module.py:363-369
    cross_attn_lr: float = 1e-4
    lora: LoRAConfig = field(default_factory=LoRAConfig)


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(asdict(cfg), indent=2, default=str)


def replace(cfg: Any, **kw: Any) -> Any:
    return dataclasses.replace(cfg, **kw)
