"""Whisper transcription CLI — the whisper.cpp `main` analog.

    python tools/transcribe.py model.gguf audio.wav --prompt-ids 50258,50259,50359,50363

Loads a 16 kHz WAV (utils/wav.py, the examples/common.cpp read_wav analog),
computes the log-mel features, runs the jitted encoder + on-device greedy
decode, and prints the produced token ids (and text when the GGUF carries
tokenizer.ggml.tokens).
"""

import argparse
import sys

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("wav")
    ap.add_argument("--prompt-ids", default="",
                    help="comma-separated forced decoder prefix "
                         "(<|sot|>[lang][task][notimestamps] ids)")
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--eot-id", type=int, default=None)
    args = ap.parse_args()

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.models.whisper import (N_FRAMES, Whisper, config_from_gguf,
                                         log_mel_spectrogram)
    from ggml_tpu.utils.wav import read_wav

    g = GGUFFile(args.model)
    cfg = config_from_gguf(g)
    m = Whisper(load_params(g), cfg, max_seq=args.max_tokens + 8)

    audio, rate = read_wav(args.wav, target_rate=16000)
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
    # window the mel to the model's receptive field (2 frames per position)
    mel = mel[:, : min(mel.shape[1], 2 * cfg.n_audio_ctx, N_FRAMES)]
    if mel.shape[1] < 2 * cfg.n_audio_ctx:
        mel = np.pad(mel, ((0, 0), (0, 2 * cfg.n_audio_ctx - mel.shape[1])))

    prompt = ([int(x) for x in args.prompt_ids.split(",") if x.strip()]
              or [0])
    toks = m.transcribe_tokens(mel, prompt, args.max_tokens, eot_id=args.eot_id)

    print("tokens:", toks)
    if "tokenizer.ggml.tokens" in g.metadata:
        from ggml_tpu.tokenizer import BPETokenizer

        tok = BPETokenizer.from_gguf(g)
        print("text:", tok.decode(toks))


if __name__ == "__main__":
    main()
