"""Full-model numerical parity against the REFERENCE'S OWN torch modules.

These tests import `/root/reference/CTPA_CLIP`'s actual `ct_clip.ctvit`,
`ct_clip.ct_clip`, and `ctpa_report.model_components`, instantiate tiny
configurations, dump their torch state_dicts through ctpa's importers
(`ctpa.data.hf_import`), and assert that ctpa reproduces the reference's
activations — encode tokens, CLIP loss / zero-shot scores, report logits —
to float32 tolerance.  This is the strongest parity evidence obtainable
without network egress (the real CT-CLIP_v2.pt / CXR-BERT / Meditron weights
cannot be fetched, but the module math is identical either way).

The reference environment is incomplete here: `beartype`,
`vector_quantize_pytorch`, and `torchvision` are not installed, and several
reference code paths hard-code `torch.device('cuda')` (e.g. attention.py:135,
ctvit.py:315).  The loader below stubs the three modules (the VQ stub is an
IDENTITY quantizer — parity is asserted on pre-VQ encodings, ctpa side runs
with `vq_state=None`) and rebinds each reference module's `torch` global to a
proxy whose `.device()` always yields CPU.  No reference code is modified.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/CTPA_CLIP"


# ---------------------------------------------------------------------------
# reference loader
# ---------------------------------------------------------------------------

def _stub_module(name):
    """types.ModuleType with a real ModuleSpec — other packages (transformers)
    probe importlib.util.find_spec and choke on __spec__ = None."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_stubs():
    if "beartype" not in sys.modules:
        bt = _stub_module("beartype")

        def beartype(func=None, **_kw):
            if func is None:
                return lambda f: f
            return func

        bt.beartype = beartype
        sys.modules["beartype"] = bt

    if "vector_quantize_pytorch" not in sys.modules:
        import torch.nn as tnn

        vqm = _stub_module("vector_quantize_pytorch")

        class VectorQuantize(tnn.Module):
            """Identity stub: the oracle compares PRE-VQ encodings; the ctpa
            side runs with vq_state=None (which also returns pre-VQ tokens)."""

            def __init__(self, dim, codebook_size, use_cosine_sim=False, **_kw):
                super().__init__()
                self.dim, self.codebook_size = dim, codebook_size

            def forward(self, x, mask=None):
                b, n, _ = x.shape
                return x, torch.zeros(b, n, dtype=torch.long), torch.zeros((), dtype=x.dtype)

        vqm.VectorQuantize = VectorQuantize
        sys.modules["vector_quantize_pytorch"] = vqm

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        for sub in ("transforms", "utils", "models"):
            mod = _stub_module(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        sys.modules["torchvision"] = tv


class _CPUTorch:
    """Delegates to the real torch but maps every `torch.device(...)` to CPU,
    neutralizing the reference's hard-coded `torch.device('cuda')` lines."""

    def __init__(self, real):
        object.__setattr__(self, "_real", real)

    def __getattr__(self, name):
        if name == "device":
            return lambda *a, **k: self._real.device("cpu")
        return getattr(self._real, name)


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    sys.dont_write_bytecode = True
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import ct_clip.attention as ref_attention
    import ct_clip.ct_clip as ref_ct_clip
    import ct_clip.ctvit as ref_ctvit
    import ctpa_report.model_components as ref_mc

    proxy = _CPUTorch(torch)
    for mod in (ref_attention, ref_ctvit, ref_ct_clip, ref_mc):
        mod.torch = proxy

    # CTCLIP.__init__ hard-downloads the CXR-BERT tokenizer (ct_clip.py:585);
    # zero egress here, and the tokenizer is unused by forward() — stub it.
    class _TokenizerStub:
        @staticmethod
        def from_pretrained(*_a, **_k):
            return None

    ref_ct_clip.BertTokenizer = _TokenizerStub
    return types.SimpleNamespace(
        attention=ref_attention, ctvit=ref_ctvit, ct_clip=ref_ct_clip,
        model_components=ref_mc)


# ---------------------------------------------------------------------------
# tiny geometries
# ---------------------------------------------------------------------------

from ctpa.core.config import (          # noqa: E402
    BertConfig, CTCLIPConfig, CTViTConfig, LLMConfig, ReportGenConfig,
)

VIT = CTViTConfig(
    dim=64, codebook_size=64, image_size=32, patch_size=8,
    temporal_size=16, temporal_patch_size=4, spatial_depth=2,
    temporal_depth=2, dim_head=16, heads=4,
    use_vq=False, peg_reference_layout=True,
)
BERT = BertConfig.tiny()


def _make_ref_ctvit(ref, seed=0):
    torch.manual_seed(seed)
    return ref.ctvit.CTViT(
        dim=VIT.dim, codebook_size=VIT.codebook_size,
        image_size=VIT.image_size, patch_size=VIT.patch_size,
        temporal_patch_size=VIT.temporal_patch_size,
        spatial_depth=VIT.spatial_depth, temporal_depth=VIT.temporal_depth,
        dim_head=VIT.dim_head, heads=VIT.heads,
        use_vgg_and_gan=False,
    ).eval()


def _video(rng, vit=VIT, b=1):
    return rng.normal(size=(
        b, 1, vit.temporal_size, vit.image_size, vit.image_size,
    )).astype(np.float32)


# ---------------------------------------------------------------------------
# CTViT: patch-embed + axial encode (pre-VQ), reference PEG layout
# ---------------------------------------------------------------------------

def test_ctvit_encode_matches_reference(ref, rng):
    from ctpa.data.hf_import import import_ctvit, overlay_base
    from ctpa.models.ctvit import CTViT

    ref_vit = _make_ref_ctvit(ref)
    video = _video(rng)
    tv = torch.tensor(video)
    with torch.no_grad():
        tokens = ref_vit.to_patch_emb(tv)
        want = ref_vit.encode(tokens).numpy()            # ctvit.py:306-331

    model = CTViT(VIT)
    init = model.init(jax.random.key(0), jnp.asarray(video), None)
    imported = import_ctvit(
        ref_vit.state_dict(), VIT.spatial_depth, VIT.temporal_depth)
    params = {"params": overlay_base(init["params"], imported, allow_missing=True)}
    got, vq_out = model.apply(params, jnp.asarray(video), None)
    assert vq_out is None
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_peg_reference_layout_flag_matters(ref, rng):
    """With the corrected (non-scrambled) PEG temporal fold the same imported
    weights must NOT reproduce reference activations — guarding that the
    parity mode is real, not a no-op."""
    from dataclasses import replace

    from ctpa.data.hf_import import import_ctvit, overlay_base
    from ctpa.models.ctvit import CTViT

    ref_vit = _make_ref_ctvit(ref)
    video = _video(rng)
    with torch.no_grad():
        want = ref_vit.encode(ref_vit.to_patch_emb(torch.tensor(video))).numpy()

    model = CTViT(replace(VIT, peg_reference_layout=False))
    init = model.init(jax.random.key(0), jnp.asarray(video), None)
    params = {"params": overlay_base(
        init["params"],
        import_ctvit(ref_vit.state_dict(), VIT.spatial_depth, VIT.temporal_depth),
        allow_missing=True)}
    got, _ = model.apply(params, jnp.asarray(video), None)
    assert np.abs(np.asarray(got) - want).max() > 1e-2


# ---------------------------------------------------------------------------
# CTCLIP: loss + zero-shot scores with an HF BERT text tower
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_clip_pair(ref):
    """(reference CTCLIP, ctpa CTCLIP + grafted params) sharing one state dict."""
    from transformers import BertConfig as HFBertConfig, BertModel

    from ctpa.data.hf_import import import_ctclip, overlay_base
    from ctpa.models.ctclip import CTCLIP

    hf_cfg = HFBertConfig(
        vocab_size=BERT.vocab_size, hidden_size=BERT.hidden_size,
        num_hidden_layers=BERT.num_layers, num_attention_heads=BERT.num_heads,
        intermediate_size=BERT.intermediate_size,
        max_position_embeddings=BERT.max_position_embeddings,
        type_vocab_size=2, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    text_encoder = BertModel(hf_cfg).eval()
    ref_vit = _make_ref_ctvit(ref, seed=2)

    s = VIT.image_size // VIT.patch_size
    clip_cfg = CTCLIPConfig.tiny(VIT, BERT)
    ref_model = ref.ct_clip.CTCLIP(
        image_encoder=ref_vit, text_encoder=text_encoder,
        dim_text=BERT.hidden_size, dim_image=s * s * VIT.dim,
        dim_latent=clip_cfg.dim_latent,
        extra_latent_projection=False, use_mlm=False,
        downsample_image_embeds=False, use_all_token_embeds=False,
    ).eval()

    model = CTCLIP(clip_cfg, VIT, BERT)
    ids = jnp.asarray([[2, 5, 9, 0]], jnp.int32)
    mask = (ids != 0).astype(jnp.int32)
    video = jnp.zeros((1, 1, VIT.temporal_size, VIT.image_size, VIT.image_size))
    init = model.init(jax.random.key(0), ids, mask, video, None)
    imported, _ = import_ctclip(
        ref_model.state_dict(), BERT, VIT.spatial_depth, VIT.temporal_depth)
    params = {"params": overlay_base(init["params"], imported, allow_missing=True)}
    return ref_model, model, params


def test_ctclip_loss_matches_reference(ref_clip_pair, rng):
    ref_model, model, params = ref_clip_pair
    b = 3
    video = _video(rng, b=b)
    ids = rng.integers(3, BERT.vocab_size, size=(b, 12)).astype(np.int64)
    ids[:, -2:] = 0
    mask = (ids != 0).astype(np.int64)

    text = types.SimpleNamespace(
        input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    with torch.no_grad():
        want = float(ref_model(text, torch.tensor(video), "cpu",
                               return_loss=True))     # ct_clip.py:614-901

    out = model.apply(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32), jnp.asarray(video), None,
                      return_loss=True)
    np.testing.assert_allclose(float(out.loss), want, rtol=1e-4, atol=1e-4)


def test_ctclip_zeroshot_scores_match_reference(ref_clip_pair, rng):
    """return_loss=False elementwise text-image scores — the zero-shot
    classification path (ct_clip.py:805-807, ctclip_inference.py:310)."""
    ref_model, model, params = ref_clip_pair
    b = 2
    video = _video(rng, b=b)
    ids = rng.integers(3, BERT.vocab_size, size=(b, 8)).astype(np.int64)
    mask = np.ones_like(ids)

    text = types.SimpleNamespace(
        input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    with torch.no_grad():
        want = ref_model(text, torch.tensor(video), "cpu",
                         return_loss=False).numpy()

    out = model.apply(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32), jnp.asarray(video), None,
                      return_loss=False)
    np.testing.assert_allclose(np.asarray(out.sim), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Report generator: VFE + cross-attention + HF llama logits
# ---------------------------------------------------------------------------

def test_report_generator_matches_reference(ref, rng):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    from ctpa.data.hf_import import import_report_generator, overlay_base
    from ctpa.models.report_generator import CTReportGenerator

    # the reference VFE hard-codes Linear(512, feature_dim)
    # (model_components.py:30); any other trunk dim trips its try/except into
    # the silent randn fallback — so the oracle trunk must be dim-512.  Only
    # the patch-embed stage runs (model_components.py:49-71), so this is cheap.
    vit512 = CTViTConfig(
        dim=512, codebook_size=64, image_size=32, patch_size=8,
        temporal_size=16, temporal_patch_size=4, spatial_depth=1,
        temporal_depth=1, dim_head=16, heads=4, use_vq=False,
    )
    llm_cfg = LLMConfig.tiny()
    gen_cfg = ReportGenConfig(vision_dim=32)

    torch.manual_seed(3)
    ref_vit = ref.ctvit.CTViT(
        dim=vit512.dim, codebook_size=vit512.codebook_size,
        image_size=vit512.image_size, patch_size=vit512.patch_size,
        temporal_patch_size=vit512.temporal_patch_size,
        spatial_depth=vit512.spatial_depth, temporal_depth=vit512.temporal_depth,
        dim_head=vit512.dim_head, heads=vit512.heads, use_vgg_and_gan=False,
    ).eval()

    class _ClipShim(torch.nn.Module):
        def __init__(self, vit):
            super().__init__()
            self.visual_transformer = vit

    vfe = ref.model_components.RobustVisionFeatureExtractor(
        _ClipShim(ref_vit), feature_dim=gen_cfg.vision_dim).eval()

    hf_llama = HFLlama(HFLlamaConfig(
        vocab_size=llm_cfg.vocab_size, hidden_size=llm_cfg.hidden_size,
        num_hidden_layers=llm_cfg.num_layers,
        num_attention_heads=llm_cfg.num_heads,
        num_key_value_heads=llm_cfg.num_kv_heads,
        intermediate_size=llm_cfg.intermediate_size,
        max_position_embeddings=llm_cfg.max_seq_len, rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=False, tie_word_embeddings=False,
    )).eval()
    xattn = ref.model_components.CrossAttentionLayer(
        text_dim=llm_cfg.hidden_size, vision_dim=gen_cfg.vision_dim).eval()
    ref_gen = ref.model_components.CTReportGenerator(
        hf_llama, vfe, cross_attention=xattn).eval()

    video = _video(rng, vit512, b=2)
    ids = rng.integers(3, llm_cfg.vocab_size, size=(2, 10)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        feats1 = vfe(torch.tensor(video))
        feats2 = vfe(torch.tensor(video))
        # the reference returns torch.randn on ANY internal error
        # (model_components.py:78-79); identical repeat calls prove the real
        # path ran and the oracle is not comparing noise
        assert torch.equal(feats1, feats2)
        want = ref_gen(torch.tensor(video), torch.tensor(ids),
                       torch.tensor(mask)).numpy()      # model_components.py:166-191

    model = CTReportGenerator(llm_cfg, vit512, gen_cfg)
    init = model.init(jax.random.key(0), jnp.asarray(video),
                      jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    imported = import_report_generator(ref_gen.state_dict(), llm_cfg)
    params = {"params": overlay_base(init["params"], imported, allow_missing=True)}
    got = model.apply(params, jnp.asarray(video), jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
