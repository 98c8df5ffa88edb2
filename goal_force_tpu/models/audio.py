"""Host-side audio feature extraction for S2V (wav2vec2).

Parity with /root/reference/diffsynth/models/wav2vec.py: a Wav2Vec2ForCTC feature
extractor whose per-layer hidden states are linearly resampled from audio rate to video
fps and bucketed into batch_frames-sized windows. Runs on host CPU via transformers torch
(audio preprocessing, like ffmpeg — not an accelerator workload); outputs feed
goal_force_tpu.models.s2v.wan_s2v_forward as numpy arrays.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def linear_interpolation(features: np.ndarray, input_fps: float, output_fps: float,
                         output_len: Optional[int] = None) -> np.ndarray:
    """(B, T, C) resample along T with align_corners=True linear interpolation
    (reference :30-42)."""
    b, t, c = features.shape
    if output_len is None:
        output_len = int(t / float(input_fps) * output_fps)
    if output_len == t:
        return features
    if output_len == 1:
        return features[:, :1]
    pos = np.linspace(0.0, t - 1, output_len)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, t - 1)
    frac = (pos - lo)[None, :, None]
    return features[:, lo] * (1 - frac) + features[:, hi] * frac


def get_audio_embed_bucket_fps(audio_embed: np.ndarray, fps: int = 16,
                               batch_frames: int = 81, m: int = 0) -> Tuple[np.ndarray, int]:
    """Bucket per-layer features into batch_frames windows (reference :147-184 semantics:
    zero-pad the tail to a whole number of buckets).

    audio_embed: (L, C, T_frames) -> (num_buckets, L, C, batch_frames), num_buckets.
    """
    layers, c, t = audio_embed.shape
    scale = batch_frames + 2 * m
    num_buckets = int(np.ceil(t / scale)) if t > 0 else 0
    padded = np.zeros((layers, c, num_buckets * scale), audio_embed.dtype)
    padded[..., :t] = audio_embed
    out = padded.reshape(layers, c, num_buckets, scale).transpose(2, 0, 1, 3)
    return out, num_buckets


class Wav2Vec2Features:
    """Extract stacked per-layer wav2vec2 hidden states for S2V conditioning.

    Requires local wav2vec2 weights (zero-egress: no hub download); from_pretrained path
    or a state dict both work.
    """

    def __init__(self, model_path: Optional[str] = None):
        import torch  # host-side only
        from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

        if model_path is not None:
            self.model = Wav2Vec2ForCTC.from_pretrained(model_path)
        else:
            self.model = Wav2Vec2ForCTC(Wav2Vec2Config())
        self.model.eval()
        self._torch = torch

    def extract(self, audio: np.ndarray, sample_rate: int = 16000, fps: int = 16,
                num_frames: Optional[int] = None) -> np.ndarray:
        """audio (T_samples,) float -> (1, num_layers, C, T_frames) layer stack resampled
        to video fps (reference extract_audio_feat :102-113)."""
        torch = self._torch
        x = torch.from_numpy(np.asarray(audio, np.float32))[None]
        with torch.no_grad():
            out = self.model.wav2vec2(x, output_hidden_states=True)
        feats = [h.numpy() for h in out.hidden_states]  # each (1, T, C)
        t_audio = feats[0].shape[1]
        input_fps = t_audio / (len(audio) / sample_rate)
        resampled = [
            linear_interpolation(f, input_fps, fps, output_len=num_frames) for f in feats
        ]
        stack = np.stack(resampled, axis=1)  # (1, L, T', C)
        return stack.transpose(0, 1, 3, 2)   # (1, L, C, T')
