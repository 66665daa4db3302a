"""BERTScore on the JAX BERT encoder (TPU-native).

The reference scores captions with the `bert_score` pip package
(evaluate.py:293-297, roberta-large under torch). This implements the
published BERTScore algorithm (Zhang et al. 2020) — contextual token
embeddings, pairwise cosine, greedy max matching, mean P/R/F1 — on the
flax BERT encoder (hirest_tpu.models.minilm.MiniLmEncoder, which loads any
HF BERT-architecture checkpoint), so caption scoring runs on TPU with no
torch at eval time.

Scores are model-dependent: with a different encoder than the reference's
roberta-large the absolute values differ, but ranking behavior is the
BERTScore algorithm verbatim. IDF weighting is off by default (matching
bert_score's default).
"""

from __future__ import annotations

import numpy as np


def bertscore_pairs(cand_embs, cand_masks, ref_embs, ref_masks):
    """Greedy-match P/R/F1 for one batch of pairs.

    cand_embs/ref_embs: [N, L, H] contextual embeddings; masks [N, L] with
    special tokens ([CLS]/[SEP]/[PAD]) zeroed.
    """
    c = np.asarray(cand_embs, np.float32)
    r = np.asarray(ref_embs, np.float32)
    cm = np.asarray(cand_masks, bool)
    rm = np.asarray(ref_masks, bool)

    c = c / np.clip(np.linalg.norm(c, axis=-1, keepdims=True), 1e-9, None)
    r = r / np.clip(np.linalg.norm(r, axis=-1, keepdims=True), 1e-9, None)
    sim = np.einsum("nld,nmd->nlm", c, r)
    sim = np.where(cm[:, :, None] & rm[:, None, :], sim, -1.0)

    # precision: each candidate token greedily matches its best ref token;
    # recall: each reference token matches its best candidate token
    precision = np.array([
        sim[i][cm[i]][:, rm[i]].max(axis=1).mean()
        if (cm[i].any() and rm[i].any()) else 0.0
        for i in range(sim.shape[0])])
    recall = np.array([
        sim[i][cm[i]][:, rm[i]].max(axis=0).mean()
        if (cm[i].any() and rm[i].any()) else 0.0
        for i in range(sim.shape[0])])
    # plain 2pr/(p+r), 0 where the denominator vanishes — cosines can be
    # negative, and clipping a NEGATIVE p+r up to epsilon would explode F1
    # to an enormous wrong value instead of the correct negative score
    denom = precision + recall
    f1 = np.where(np.abs(denom) < 1e-9, 0.0,
                  2 * precision * recall / np.where(denom == 0, 1.0, denom))
    return precision, recall, f1


def make_bertscore_fn(ckpt_path: str, vocab_path: str, max_length: int = 64,
                      config=None, batch_size: int = 32):
    """Build a `(cands, refs) -> mean F1` callable (the evaluator's
    bertscore_fn plugin surface) on the flax BERT encoder."""
    import jax
    import jax.numpy as jnp

    from hirest_tpu.models.convert import load_torch_ckpt
    from hirest_tpu.models.minilm import MiniLmConfig, MiniLmEncoder, convert_minilm
    from hirest_tpu.tokenizers import WordPieceTokenizer

    cfg = config or MiniLmConfig()
    tok = WordPieceTokenizer(vocab_path)
    cls_id, sep_id = tok.vocab["[CLS]"], tok.vocab["[SEP]"]
    model = MiniLmEncoder(cfg)
    params = {"params": convert_minilm(load_torch_ckpt(ckpt_path), cfg)}
    apply = jax.jit(lambda p, ids, mask: model.apply(p, ids, mask, pool=False))

    def encode(texts):
        n = len(texts)
        ids = np.zeros((n, max_length), np.int32)
        attn = np.zeros((n, max_length), np.int32)
        content = np.zeros((n, max_length), bool)  # excludes CLS/SEP/PAD
        for i, text in enumerate(texts):
            toks = tok.convert_tokens_to_ids(tok.tokenize(text))[: max_length - 2]
            row = [cls_id] + toks + [sep_id]
            ids[i, : len(row)] = row
            attn[i, : len(row)] = 1
            content[i, 1: 1 + len(toks)] = True
        embs = np.asarray(apply(params, jnp.asarray(ids), jnp.asarray(attn)))
        return embs, content

    def bertscore(cands, refs):
        f1s = []
        for i in range(0, len(cands), batch_size):
            c_emb, c_mask = encode(list(cands[i: i + batch_size]))
            r_emb, r_mask = encode(list(refs[i: i + batch_size]))
            _, _, f1 = bertscore_pairs(c_emb, c_mask, r_emb, r_mask)
            f1s.extend(f1.tolist())
        return float(np.mean(f1s)) if f1s else 0.0

    return bertscore


def make_hf_entailment_fn(model_dir: str, label_order=("entailment",
                                                       "contradiction",
                                                       "neutral")):
    """Entailment plugin from any LOCAL HF NLI sequence-classification
    checkpoint (torch CPU, eval-time only — mirrors the reference's use of
    an external entailment model, evaluate.py:197-201). Returns
    fn(premise, hypothesis) -> index into (entail, contradict, neutral)."""
    import torch
    from transformers import (AutoModelForSequenceClassification,
                              AutoTokenizer)

    from hirest_tpu.models.nli import nli_label_remap

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = AutoModelForSequenceClassification.from_pretrained(model_dir).eval()
    remap = nli_label_remap(dict(model.config.id2label), label_order)

    def entailment(premise: str, hypothesis: str) -> int:
        with torch.no_grad():
            inputs = tok(premise, hypothesis, return_tensors="pt",
                         truncation=True, max_length=256)
            logits = model(**inputs).logits[0]
        return remap[int(logits.argmax())]

    return entailment
