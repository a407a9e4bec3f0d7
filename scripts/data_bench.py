"""Data-plane throughput: native batch assembler vs per-item paths.

Builds a synthetic 256-utterance corpus (~870-frame mels, parity
mel_dim 80), then measures end-to-end batch assembly (load + normalize
+ collate) three ways:

* native-batch: ONE C++ call per batch (threaded load+normalize+pad)
* native-per-item: per-utterance fused C++ reads (round-1 path)
* numpy: pure-Python np.load + normalize

Run: python scripts/data_bench.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.data import DataLoader, TTSDataset
    from transformer_tts_tpu.data import native

    root = tempfile.mkdtemp(prefix="data_bench_")
    rs = np.random.RandomState(0)
    n_utt, mel_dim = 256, 80
    lines = []
    for i in range(n_utt):
        t_text = rs.randint(60, 100)
        t_mel = t_text * 9
        base = os.path.join(root, f"utt{i}.npy")
        np.save(base, rs.randn(t_mel, mel_dim).astype(np.float32))
        np.save(base.replace(".npy", "_alignment.npy"),
                np.full((t_text,), 9, np.int32))
        np.save(base.replace(".npy", "_f0.npy"),
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(base.replace(".npy", "_energy.npy"),
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 100, t_text))
        lines.append(f"{base}|{ids}")
    script = os.path.join(root, "train.txt")
    with open(script, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    mean = os.path.join(root, "mean.npy")
    var = os.path.join(root, "var.npy")
    np.save(mean, rs.rand(mel_dim).astype(np.float32))
    np.save(var, rs.rand(mel_dim).astype(np.float32) + 0.5)

    hp = HParams(mel_dim=mel_dim, vocab_size=100, batch_size=32,
                 mean_file=mean, var_file=var)

    class PerItemDS(TTSDataset):
        def load_batch_samples(self, indices, n_threads=8):
            return [self[i] for i in indices]

    def run(name, ds, workers):
        loader = DataLoader(ds, hp, num_workers=workers)
        # warm the page cache
        for _ in loader:
            pass
        t0 = time.time()
        frames = 0
        for batch in loader:
            frames += int(batch["mel_length"].sum())
        dt = time.time() - t0
        print(f"{name:28s} {n_utt / dt:8.1f} utt/s "
              f"({frames / dt / 1e6:6.2f} M frames/s)", flush=True)

    assert native.available(), "native library unavailable"
    print(f"host cores: {os.cpu_count()} (the threaded batch call "
          "parallelizes only with >1)", flush=True)
    run("native batch (1 call/batch)", TTSDataset(script, hp), 2)
    run("native per-item", PerItemDS(script, hp), 8)
    orig = native._lib
    native._lib = None
    native._lib_tried = True
    run("numpy per-item", PerItemDS(script, hp), 8)
    native._lib = orig


if __name__ == "__main__":
    main()
