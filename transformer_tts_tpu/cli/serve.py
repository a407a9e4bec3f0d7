"""Serving CLI: bucketed AOT warmup + micro-batching HTTP synthesis.

``python -m transformer_tts_tpu.cli.serve --load_name <ckpt_dir> \
      [--port 8571] [--batch_size 8] [--buckets 32,64,128] \
      [--export <dir>]``

With ``--export``, writes one serialized ``jax.export`` StableHLO
artifact per text bucket (weights baked in) plus ``manifest.json`` and
exits — the deployable unit for a non-Python serving binary. Otherwise
warms every (batch, bucket) signature and serves
``POST /synthesize {"text_ids": [...]}`` / ``GET /healthz``.

Beyond-reference: the reference's synthesis scripts are offline batch-1
loops (test_fastspeech2.py:146-204); this is the production path the
task's serving goal asks for.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_name", type=str, required=True)
    parser.add_argument("--hp_file", type=str, default=None)
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8571)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--frames_per_phone", type=int, default=8)
    parser.add_argument("--buckets", type=str, default=None,
                        help="comma-separated text buckets "
                             "(default: hp.text_buckets)")
    parser.add_argument("--batch_window_ms", type=float, default=5.0)
    parser.add_argument("--max_queue", type=int, default=256,
                        help="admission bound; beyond it requests get "
                             "503 instead of unbounded queueing")
    parser.add_argument("--export", type=str, default=None,
                        help="write jax.export artifacts here and exit")
    parser.add_argument("--vocoder", type=str, default=None,
                        help="neural-vocoder checkpoint (generator "
                             "export from cli.train_vocoder); wav "
                             "responses use it instead of Griffin-Lim")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=("int8",),
                        help="weight-only quantization of the acoustic "
                             "model: weights stream from HBM as int8 + "
                             "per-channel scale (infer/quantize.py)")
    parser.add_argument("--post_model", type=str, default=None,
                        help="mel-mel PostLowEnergy student checkpoint; "
                             "the refinement is fused into the jitted "
                             "serving forward")
    parser.add_argument("--ref_mel", type=str, default=None,
                        help="style reference mel .npy for GST models "
                             "(required when hp.gst)")
    args = parser.parse_args(argv)

    from transformer_tts_tpu.infer.engine import TTSEngine

    buckets = None
    if args.buckets:
        buckets = tuple(int(b) for b in args.buckets.split(","))
    engine = TTSEngine(
        args.load_name, args.hp_file, epoch=args.epoch,
        batch_size=args.batch_size, frames_per_phone=args.frames_per_phone,
        text_buckets=buckets, vocoder=args.vocoder,
        quantize=args.quantize, post_model=args.post_model,
        ref_mel=args.ref_mel)
    if engine.quantize_stats is not None:
        s = engine.quantize_stats
        print(f"int8 weights: {s['n_quantized']} tensors quantized, "
              f"{s['bytes_fp'] / 1e6:.1f} MB -> {s['bytes_q'] / 1e6:.1f} MB "
              f"({s['compression']:.2f}x)", flush=True)

    if args.export:
        manifest = engine.export(args.export)
        print(json.dumps(manifest, indent=2))
        return

    print("warming up (AOT compile per bucket)...", flush=True)
    times = engine.warmup()
    for b, s in times.items():
        print(f"  bucket {b:4d}: {s:6.1f} s "
              f"(max_frames {engine.max_frames_for(b)})", flush=True)

    from transformer_tts_tpu.infer.server import TTSServer
    server = TTSServer(engine, host=args.host, port=args.port,
                       batch_window_ms=args.batch_window_ms,
                       max_queue=args.max_queue)
    print(f"serving on http://{args.host}:{server.port}  "
          f"(batch {engine.batch_size}, buckets {engine.text_buckets})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    sys.exit(main())
