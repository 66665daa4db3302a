"""NLI cross-encoder for the Entailment step-captioning metric, in flax.

The reference always scores Entailment/Contradiction/Neutral with AllenNLP's
``pair-classification-decomposable-attention-elmo`` predictor
(reference evaluate.py:197-201, 275-286): ``argmax(label_probs)`` over the
SNLI label order (entailment, contradiction, neutral). That exact model is
ELMo-data-blocked in this image, so the metric here is computed by a
BERT-architecture NLI cross-encoder with HF ``BertForSequenceClassification``
semantics — ``[CLS] premise [SEP] hypothesis [SEP]`` with segment ids →
tanh pooler over [CLS] → 3-way classifier — reusing the flax BERT encoder
(hirest_tpu.models.minilm.MiniLmEncoder) plus a converter that loads any HF
BERT NLI checkpoint (MNLI/SNLI fine-tunes) and remaps its label order to the
reference's. Parity vs torch is pinned by tests/test_nli.py (random-weight
oracle, the MiniLM pattern).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hirest_tpu.models.minilm import MiniLmConfig, MiniLmEncoder, convert_minilm

# the reference's output order (evaluate.py:283-286: index 0 counts as
# "Entailment", 1 "Contradiction", 2 "Netural")
REFERENCE_LABEL_ORDER = ("entailment", "contradiction", "neutral")


class NliCrossEncoder(nn.Module):
    """(input_ids, attention_mask, token_type_ids) [B, L] -> logits [B, 3]."""

    config: MiniLmConfig = MiniLmConfig()
    num_labels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 token_type_ids: jnp.ndarray) -> jnp.ndarray:
        x = MiniLmEncoder(self.config, dtype=self.dtype, name="encoder")(
            input_ids, attention_mask, pool=False,
            token_type_ids=token_type_ids)
        pooled = jnp.tanh(nn.Dense(self.config.hidden_size, name="pooler",
                                   dtype=self.dtype)(x[:, 0]))
        return nn.Dense(self.num_labels, name="classifier",
                        dtype=self.dtype)(pooled)


def convert_nli(sd: dict, cfg: MiniLmConfig = MiniLmConfig()) -> dict:
    """HF BertForSequenceClassification state dict -> NliCrossEncoder params."""
    from hirest_tpu.models.convert import _linear

    pooler = ("bert.pooler.dense" if "bert.pooler.dense.weight" in sd
              else "pooler.dense")
    return {
        "encoder": convert_minilm(sd, cfg),
        "pooler": _linear(sd, pooler),
        "classifier": _linear(sd, "classifier"),
    }


def nli_label_remap(id2label: dict, label_order=REFERENCE_LABEL_ORDER) -> dict:
    """{checkpoint label index -> reference label index}; NLI fine-tunes
    disagree on label order (MNLI's is contradiction/neutral/entailment,
    SNLI fine-tunes vary), so the checkpoint's id2label is authoritative."""
    remap = {}
    for idx, label in id2label.items():
        label = label.lower()
        for j, want in enumerate(label_order):
            if want.startswith(label[:6]) or label.startswith(want[:6]):
                remap[int(idx)] = j
    assert len(remap) == len(id2label), f"unmapped NLI labels: {id2label}"
    return remap


def _hf_bert_config(model_dir: str) -> tuple[MiniLmConfig, dict]:
    """(MiniLmConfig, id2label) from an HF model dir's config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    if hf.get("model_type", "bert") != "bert":
        raise ValueError(
            f"flax NLI path supports BERT-architecture checkpoints; got "
            f"model_type={hf.get('model_type')!r} (the torch plugin "
            f"make_hf_entailment_fn handles other architectures)")
    cfg = MiniLmConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        norm_eps=hf.get("layer_norm_eps", 1e-12),
    )
    id2label = hf.get("id2label")
    if id2label:
        id2label = {int(k): v for k, v in dict(id2label).items()}
        if all(str(v).lower().startswith("label_") for v in id2label.values()):
            # transformers auto-fills LABEL_0/LABEL_1/... when the fine-tune
            # never set real names — that carries no order information
            id2label = None
    return cfg, id2label


def encode_pair(tok, premise: str, hypothesis: str, max_length: int):
    """BERT pair encoding: [CLS] a [SEP] b [SEP]; segment 1 starts after the
    first [SEP]. Longest-first truncation (HF ``truncation='longest_first'``)."""
    cls_id, sep_id = tok.vocab["[CLS]"], tok.vocab["[SEP]"]
    a = tok.convert_tokens_to_ids(tok.tokenize(premise))
    b = tok.convert_tokens_to_ids(tok.tokenize(hypothesis))
    while len(a) + len(b) > max_length - 3:
        (a if len(a) >= len(b) else b).pop()
    ids = [cls_id] + a + [sep_id] + b + [sep_id]
    types = [0] * (len(a) + 2) + [1] * (len(b) + 1)
    n = len(ids)
    out_ids = np.zeros(max_length, np.int32)
    out_types = np.zeros(max_length, np.int32)
    out_mask = np.zeros(max_length, np.int32)
    out_ids[:n], out_types[:n], out_mask[:n] = ids, types, 1
    return out_ids, out_types, out_mask


def make_nli_entailment_fn(model_dir: str, max_length: int = 128,
                           label_order=REFERENCE_LABEL_ORDER,
                           id2label: dict | None = None):
    """Build the evaluator's ``entailment_fn`` plugin surface —
    ``fn(premise, hypothesis) -> index into (entail, contradict, neutral)``
    — on the flax cross-encoder, from an HF model dir (model.safetensors /
    pytorch_model.bin / model.bin + config.json + vocab.txt).

    The returned fn also exposes ``fn.batch(pairs) -> list[int]``, which the
    evaluator prefers: pairs are scored in padded power-of-two buckets
    (chunked at 256) so thousands of caption pairs cost dozens of jitted
    dispatches instead of one blocking [1, L] round trip each — per-call
    relay latency dominates a tiny forward through the axon tunnel.

    ``id2label`` overrides the checkpoint's label order for config.jsons
    that carry none; guessing one silently swaps Entailment and
    Contradiction (MNLI's order is contradiction/neutral/entailment, the
    reference's is entailment/contradiction/neutral), so absent both we
    fail loudly instead."""
    import jax

    from hirest_tpu.models.convert import load_torch_ckpt
    from hirest_tpu.tokenizers import WordPieceTokenizer

    cfg, ckpt_id2label = _hf_bert_config(model_dir)
    if id2label is not None:
        id2label = {int(k): v for k, v in dict(id2label).items()}
    else:
        id2label = ckpt_id2label
    if id2label is None:
        raise ValueError(
            f"{model_dir}/config.json carries no informative id2label and "
            f"none was passed; NLI fine-tunes disagree on class order, so "
            f"guessing would silently swap Entailment and Contradiction. "
            f"Pass id2label=, e.g. "
            f"{{0: 'contradiction', 1: 'neutral', 2: 'entailment'}} (MNLI).")
    remap = nli_label_remap(id2label, label_order)
    names = ("model.safetensors", "pytorch_model.bin", "model.bin", "model.pt")
    ckpt = next((os.path.join(model_dir, n) for n in names
                 if os.path.exists(os.path.join(model_dir, n))), None)
    if ckpt is None:
        raise FileNotFoundError(
            f"no NLI checkpoint in {model_dir}; expected one of {names}")
    tok = WordPieceTokenizer(os.path.join(model_dir, "vocab.txt"))
    model = NliCrossEncoder(cfg, num_labels=len(id2label))
    params = {"params": convert_nli(load_torch_ckpt(ckpt), cfg)}
    apply = jax.jit(lambda p, ids, mask, types: model.apply(p, ids, mask, types))
    # pad rows get a bare [CLS][SEP][SEP] encoding (not an all-zero mask,
    # which would softmax over an empty row); their logits are discarded
    pad_row = encode_pair(tok, "", "", max_length)

    def batch(pairs) -> list:
        out = []
        for lo in range(0, len(pairs), 256):
            chunk = pairs[lo:lo + 256]
            n = len(chunk)
            cap = max(8, 1 << (n - 1).bit_length())
            ids = np.tile(pad_row[0], (cap, 1))
            types = np.tile(pad_row[1], (cap, 1))
            mask = np.tile(pad_row[2], (cap, 1))
            for i, (premise, hypothesis) in enumerate(chunk):
                ids[i], types[i], mask[i] = encode_pair(
                    tok, premise, hypothesis, max_length)
            logits = np.asarray(apply(params, jnp.asarray(ids),
                                      jnp.asarray(mask),
                                      jnp.asarray(types)))[:n]
            out.extend(remap[int(k)] for k in logits.argmax(1))
        return out

    def entailment(premise: str, hypothesis: str) -> int:
        return batch([(premise, hypothesis)])[0]

    entailment.batch = batch
    return entailment
