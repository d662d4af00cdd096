"""Host-side itemization of the ONT long-read penalty (VERDICT r2 weak #4).

bench_realistic reports 93 Mbase/s at 150 bp but 55 Mbase/s at 20 kb with
the same dense wire format.  The device step and wire bytes/Mbase are
identical by construction (dense rows, k-1 halo), so the penalty must be
host-side (parse/encode/pack) or pipeline-shaped (batch cadence).  This
profiles CPU-only:

  stage A: native batch reader drain (parse+encode+dense-pack), per readlen
  stage B: rows yielded per Mbase (wire efficiency; dense waste)
  stage C: python fallback reader drain (sanity scale)

Usage: python scripts/profile_ont_host.py [mbases=100]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def gen(fq, mbases, readlen, rng):
    n_reads = mbases * 1_000_000 // readlen
    alpha = np.array([65, 67, 71, 84], dtype=np.uint8)
    with open(fq, "wb") as fh:
        qual = b"I" * readlen
        chunk = max(1, 50_000_000 // (readlen * 4))
        for c0 in range(0, n_reads, chunk):
            nn = min(chunk, n_reads - c0)
            reads = alpha[rng.integers(0, 4, size=(nn, readlen))]
            fh.write(
                b"".join(
                    b"@r%d\n" % (c0 + i) + reads[i].tobytes() + b"\n+\n"
                    + qual + b"\n"
                    for i in range(nn)
                )
            )
    return n_reads


def drain(reader):
    t0 = time.perf_counter()
    rows = 0
    batches = 0
    for b in reader:
        rows += b.codes.shape[0]
        batches += 1
    return time.perf_counter() - t0, rows, batches


def main() -> None:
    mbases = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rng = np.random.default_rng(7)
    d = tempfile.mkdtemp(prefix="ntsm_ontprof_")

    from ntsm_tpu.io.fastx import BatchReader

    for readlen in (150, 2000, 20000):
        fq = os.path.join(d, f"r{readlen}.fq")
        t0 = time.perf_counter()
        gen(fq, mbases, readlen, rng)
        tg = time.perf_counter() - t0
        nb = os.path.getsize(fq)
        print(f"== readlen={readlen}  ({nb/1e6:.0f} MB file, gen {tg:.0f}s)")

        for dense in (True, False):
            r = BatchReader(
                [fq], k=19, seglen=256, batch=32768, dense=dense
            )
            dt, rows, batches = drain(r)
            wire_mb = rows * 256 * 0.375 / 1e6  # packed 3 bits? no: u8->
            # the wire is 2-bit packed 4 codes/byte at upload: 256/4 B/row
            wire_mb = rows * (256 // 4) / 1e6
            print(
                f"  native dense={int(dense)}: {dt:6.1f} s "
                f"{mbases/dt:6.1f} Mbase/s  rows={rows}  "
                f"batches={batches}  wire={wire_mb:.0f} MB "
                f"({wire_mb/mbases:.3f} B/base)"
            )
        os.unlink(fq)


if __name__ == "__main__":
    main()
