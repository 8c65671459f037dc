"""Zero-shot classification CLI — CTCLIP over a labeled inference set.

Replaces ct_clip/ctclip_inference.py + run_inference.py: encode each volume
ONCE, score all pathology prompt pairs from cached prompt latents, write
npz/xlsx/txt artifacts and the AUROC/bootstrap evaluation (SURVEY.md §3.2:
the reference runs 36 full forwards per volume; this runs one)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

from ctpa.core.config import BertConfig, CTCLIPConfig, CTViTConfig, PreprocessConfig
from ctpa.data.datasets import CTReportInferenceDataset
from ctpa.data.tokenizer import HFTokenizer, SimpleWordTokenizer
from ctpa.eval.artifacts import write_zeroshot_artifacts
from ctpa.eval.classification import bootstrap_cis, evaluate_classification
from ctpa.eval.zeroshot import PATHOLOGIES, ZeroShotClassifier
from ctpa.models.ctclip import CTCLIP
from ctpa.ops.preprocess import preprocess_volume_inference
from ctpa.ops.vq import vq_init


def run_zeroshot(
    model: CTCLIP,
    params,
    vq_state,
    dataset,
    tokenizer,
    out_dir: str,
    pathologies=PATHOLOGIES,
    pre_cfg: PreprocessConfig = PreprocessConfig.inference(),
    batch_size: int = 4,
) -> dict:
    """Library entry used by both this CLI and the trainer's periodic eval."""

    @jax.jit
    def encode_image(video):
        lat, _ = model.apply(params, video, vq_state, method=CTCLIP.encode_image)
        return lat

    @jax.jit
    def encode_text(ids, mask):
        return model.apply(params, ids, mask, method=CTCLIP.encode_text)

    def tokenize(texts):
        out = tokenizer(texts)
        return jnp.asarray(out["input_ids"]), jnp.asarray(out["attention_mask"])

    temp = float(np.exp(np.asarray(jax.device_get(params["params"]["temperature"]))))
    clf = ZeroShotClassifier(encode_text, tokenize, temp, pathologies)

    preds, reals, accs = [], [], []
    buf = []
    for i in range(len(dataset)):
        s = dataset[i]
        video = preprocess_volume_inference(jnp.asarray(s.volume), cfg=pre_cfg)
        buf.append((video, s.labels, s.accession))
        if len(buf) == batch_size or i == len(dataset) - 1:
            videos = jnp.stack([b[0] for b in buf])
            lat = encode_image(videos)
            # keep scores on device: dispatches pipeline (async) and the
            # single fetch below pays one host roundtrip for the whole set
            preds.append(clf.score(lat))
            reals.extend([b[1] for b in buf])
            accs.extend([b[2] for b in buf])
            buf = []
    predictions = np.asarray(jnp.concatenate(preds, axis=0))
    labels = np.stack(reals)

    aurocs = evaluate_classification(predictions, labels, pathologies,
                                     plot_dir=out_dir)
    cis = bootstrap_cis(predictions, labels, pathologies, n_samples=500)
    write_zeroshot_artifacts(out_dir, predictions, labels, accs, aurocs)
    cis.to_csv(f"{out_dir}/bootstrap_cis.csv", index=False)
    return {"mean_auc": float(aurocs["mean_auc"].iloc[0]),
            "n": int(labels.shape[0])}


def main(argv=None):
    from ctpa.core.compilation_cache import enable_compilation_cache
    enable_compilation_cache()   # serving/train cold-start: reuse compiled programs
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--reports-csv", required=True)
    p.add_argument("--labels-csv", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--tokenizer", default=None, help="local HF tokenizer path")
    p.add_argument("--out-dir", default="zeroshot_results")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--tiny", action="store_true", help="tiny config smoke mode")
    args = p.parse_args(argv)

    if args.tiny:
        vit_cfg, bert_cfg = CTViTConfig.tiny(), BertConfig.tiny()
        clip_cfg = CTCLIPConfig.tiny(vit_cfg, bert_cfg)
    else:
        vit_cfg, bert_cfg, clip_cfg = CTViTConfig(), BertConfig(), CTCLIPConfig()
    model = CTCLIP(clip_cfg, vit_cfg, bert_cfg)
    vq_state = vq_init(jax.random.key(0), vit_cfg.codebook_size, vit_cfg.dim)

    from ctpa.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(args.checkpoint_dir)
    state = mgr.restore()
    if state is None:
        print("no checkpoint found", file=sys.stderr)
        return 1
    # targetless orbax restore yields plain dicts — rebuild typed leaves
    if isinstance(state, dict):
        params = state["params"]
        vq_raw = state.get("vq_state")
        if isinstance(vq_raw, dict):
            from ctpa.ops.vq import VQState

            vq_state = VQState(**{k: jnp.asarray(v) for k, v in vq_raw.items()})
    else:
        params = state.params
        vq_state = state.vq_state or vq_state

    tokenizer = (HFTokenizer(args.tokenizer) if args.tokenizer
                 else SimpleWordTokenizer(
                     vocab_size=bert_cfg.vocab_size,
                     max_length=min(512, bert_cfg.max_position_embeddings)))
    dataset = CTReportInferenceDataset(
        args.data_dir, args.reports_csv, args.labels_csv, PATHOLOGIES)
    import dataclasses

    pre_cfg = dataclasses.replace(
        PreprocessConfig.inference(),
        target_shape=(vit_cfg.temporal_size, vit_cfg.image_size, vit_cfg.image_size))
    summary = run_zeroshot(model, params, vq_state, dataset, tokenizer,
                           args.out_dir, pre_cfg=pre_cfg,
                           batch_size=args.batch_size)
    print(summary, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
