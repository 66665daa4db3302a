"""ASR transcription + per-segment sentence embeddings.

Reference surface: extraction/whisper_ASR/extract_ASR.py (Whisper small.en,
beam 5, temperature-fallback schedule, .srt output) and
extract_ASR_embedding.py (MiniLM-L6-v2 384-d or CLIP text 512-d per
subtitle segment).

Whisper is not vendored in this image; `transcribe_*` raises with guidance
unless the `whisper` package is importable. The embedding step works with
sentence-transformers (vendored) or the JAX EVA/CLIP text tower.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from hirest_tpu.data.srt import load_srt


def format_srt_timestamp(seconds: float) -> str:
    ms = int(round(seconds * 1000))
    h, ms = divmod(ms, 3600_000)
    m, ms = divmod(ms, 60_000)
    s, ms = divmod(ms, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def segments_to_srt(segments) -> str:
    """[{start, end, text}] -> SRT document."""
    lines = []
    for i, seg in enumerate(segments, 1):
        lines.append(str(i))
        lines.append(f"{format_srt_timestamp(seg['start'])} --> "
                     f"{format_srt_timestamp(seg['end'])}")
        lines.append(seg["text"].strip())
        lines.append("")
    return "\n".join(lines)


def transcribe_audio_dir(audio_dir: str, srt_dir: str, model_name: str = "small.en",
                         beam_size: int = 5) -> int:
    """Whisper transcription with the reference's decoding config
    (beam 5, temperature fallback handled inside whisper.transcribe)."""
    try:
        import whisper
    except ImportError as e:
        raise ImportError(
            "openai-whisper is not installed in this image; transcribe on a "
            "host with whisper available, or bring .srt transcripts directly "
            "(the data pipeline only needs the .srt files)") from e

    model = whisper.load_model(model_name)
    audio_dir, srt_dir = Path(audio_dir), Path(srt_dir)
    srt_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for wav in sorted(audio_dir.glob("*.wav")):
        out = srt_dir / f"{wav.stem}.srt"
        if out.exists():
            continue
        result = model.transcribe(str(wav), beam_size=beam_size,
                                  temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0))
        out.write_text(segments_to_srt(result["segments"]))
        n += 1
    return n


def embed_srt_dir(srt_dir: str, out_dir: str, encoder: str = "minilm",
                  encode_text_fn=None) -> int:
    """Per-subtitle-segment sentence embeddings -> {video_id}.npy
    [n_segments, dim]. encoder: 'minilm' (384-d, sentence-transformers),
    or 'fn' with an injected encode_text_fn (e.g. the CLIP text tower)."""
    srt_dir, out_dir = Path(srt_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if encoder == "minilm":
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("all-MiniLM-L6-v2")
        encode = lambda texts: np.asarray(model.encode(texts))  # noqa: E731
    elif encoder == "fn":
        assert encode_text_fn is not None
        encode = lambda texts: np.asarray(encode_text_fn(texts))  # noqa: E731
    else:
        raise ValueError(encoder)

    n = 0
    for srt_path in sorted(srt_dir.glob("*.srt")):
        out = out_dir / f"{srt_path.stem}.npy"
        if out.exists():
            continue
        subs = load_srt(str(srt_path))
        if not subs:
            continue
        embs = encode([s.text for s in subs]).astype(np.float32)
        np.save(out, embs)
        n += 1
    return n
