"""Weight-import parity: tiny HF torch models (built locally from config, no
network) -> converters -> our flax models must reproduce HF outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import BertConfig, LLMConfig, LoRAConfig
from ctpa.data.hf_import import import_bert, import_llama, overlay_base
from ctpa.models.bert import BertEncoder
from ctpa.models.llm import LlamaForCausalLM

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig as HFBertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    cfg = BertConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position_embeddings=64)
    return model, cfg


def test_bert_import_matches_hf(hf_bert):
    model, cfg = hf_bert
    ids = np.array([[2, 5, 9, 11, 0, 0], [3, 7, 13, 17, 19, 23]], np.int64)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    params = {"params": import_bert(model.state_dict(), cfg)}
    ours = BertEncoder(cfg)
    got, cls = ours.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls), want[:, 0], rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def hf_llama():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM as HFLlama

    hf_cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = HFLlama(hf_cfg).eval()
    cfg = LLMConfig(vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, intermediate_size=64, max_seq_len=128)
    return model, cfg


def test_llama_import_matches_hf(hf_llama):
    model, cfg = hf_llama
    ids = np.array([[1, 5, 9, 11, 40, 7]], np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()

    ours = LlamaForCausalLM(cfg)
    init = ours.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    imported = import_llama(model.state_dict(), cfg)
    params = {"params": overlay_base(init["params"], imported)}
    got, _, _ = ours.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_llama_import_with_lora_overlay(hf_llama):
    """Import into a LoRA-enabled model: outputs must equal HF (LoRA starts as
    identity) and LoRA leaves must survive the graft."""
    model, cfg = hf_llama
    lora = LoRAConfig(rank=2, alpha=4.0, target_projections=("q_proj", "v_proj"))
    ids = np.array([[1, 5, 9, 11]], np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()

    ours = LlamaForCausalLM(cfg, lora=lora)
    init = ours.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    params = {"params": overlay_base(init["params"], import_llama(model.state_dict(), cfg))}
    got, _, _ = ours.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
    assert "lora_a" in params["params"]["model"]["layers_0"]["self_attn"]["q_proj"]


def test_overlay_base_shape_mismatch_fails(hf_llama):
    model, cfg = hf_llama
    ours = LlamaForCausalLM(cfg)
    init = ours.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    bad = {"model": {"norm": {"weight": np.zeros(7)}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        overlay_base(init["params"], bad)


def test_vgg_features_import_matches_torch():
    """Golden test on a synthetic VGG16-shaped state dict (ctvit.py:202):
    a torch Sequential with the exact torchvision `features` layout, random
    weights, vs PerceptualNet.vgg16() with converted weights — per-stage
    feature maps must agree."""
    import torch.nn as tnn

    from ctpa.data.hf_import import VGG16_FEATURE_CONV_INDICES, import_vgg_features
    from ctpa.models.discriminator import PerceptualNet

    # torchvision vgg16().features: 13 convs in 5 blocks, relu after each,
    # max-pool between blocks
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    features = tnn.Sequential(*layers)
    torch.manual_seed(0)
    for m in features.modules():
        if isinstance(m, tnn.Conv2d):
            tnn.init.normal_(m.weight, std=0.05)
            tnn.init.normal_(m.bias, std=0.05)
    sd = features.state_dict()
    assert set(int(k.split(".")[0]) for k in sd if k.endswith(".weight")) == {
        i for block in VGG16_FEATURE_CONV_INDICES for i in block
    }

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    # torch per-stage features: capture input of each MaxPool
    feats_torch, t = [], torch.tensor(x)
    with torch.no_grad():
        for layer in features:
            if isinstance(layer, tnn.MaxPool2d):
                feats_torch.append(t.numpy())
            t = layer(t)

    net = PerceptualNet.vgg16()
    params = import_vgg_features(sd)
    feats = net.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats) == len(feats_torch) == 5
    for got, want in zip(feats, feats_torch):
        np.testing.assert_allclose(
            np.asarray(got), want.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_vgg_import_changes_perceptual_loss():
    """PerceptualNet loads converted weights and perceptual_loss responds
    (VERDICT missing #4 done-criterion)."""
    from ctpa.data.hf_import import import_vgg_features
    from ctpa.models.discriminator import PerceptualNet, perceptual_loss

    rng = np.random.default_rng(0)
    # bare-features layout ('0.weight', ...), truncated to 3 stages
    sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128),
             (128, 256), (256, 256), (256, 256)]
    for idx, (ci, co) in zip((0, 2, 5, 7, 10, 12, 14), chans):
        sd[f"{idx}.weight"] = torch.tensor(
            rng.normal(size=(co, ci, 3, 3)).astype(np.float32) * 0.05)
        sd[f"{idx}.bias"] = torch.tensor(np.zeros(co, np.float32))
    net = PerceptualNet(stages=(64, 128, 256), convs_per_stage=(2, 2, 3))
    params = import_vgg_features(sd, n_stages=3)

    a = jnp.asarray(rng.normal(size=(1, 16, 16, 1)), jnp.float32)
    b = a + 0.3
    d_rand = perceptual_loss(
        net.init(jax.random.key(0), jnp.repeat(a, 3, -1)), net, a, b)
    d_imp = perceptual_loss(params, net, a, b)
    assert float(perceptual_loss(params, net, a, a)) == 0.0
    assert float(d_imp) > 0.0
    assert not np.isclose(float(d_imp), float(d_rand))
    # reference exact formulation: single MSE on the final stack output
    d_final = perceptual_loss(params, net, a, b, final_only=True)
    assert float(d_final) > 0.0
