#!/usr/bin/env python
"""Loader throughput: PrefetchLoader sustained examples/s vs the device
ceiling (VERDICT r1 weak #5: the producer must keep up with ~20k
examples/s at the batch-1024 bf16 ceiling).

Measures, on a realistic-size synthetic SwiftMHC HDF5:
  1. raw HDF5 entry decode rate (dataset.__getitem__ through the thread
     pool, no collate/upload);
  2. full loader drain rate (collate + device_put + queue) with no
     consumer work — the loader-only ceiling;
  3. loader rate with a consumer that sleeps per batch to emulate the
     device step at the measured throughput — the no-starvation check.

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=4096)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--num-workers", type=int, default=4)
    ap.add_argument("--device-examples-per-sec", type=float, default=20700.0,
                    help="emulated device consumption rate (bf16 B=1024 ceiling)")
    ap.add_argument("--epochs", type=int, default=2,
                    help="measure the LAST epoch (first warms the page cache)")
    args = ap.parse_args()

    from concurrent.futures import ThreadPoolExecutor

    from pmhc_tpu.data import PmhcDataset, PrefetchLoader, write_synthetic_hdf5

    with tempfile.TemporaryDirectory() as d:
        h5 = os.path.join(d, "bench.hdf5")
        t0 = time.perf_counter()
        write_synthetic_hdf5(h5, n_entries=args.entries,
                             peptide_lengths=(8, 9, 10, 11), seed=0)
        print(json.dumps({
            "fixture_entries": args.entries,
            "fixture_mb": round(os.path.getsize(h5) / 1e6, 1),
            "write_s": round(time.perf_counter() - t0, 1),
        }), flush=True)

        ds = PmhcDataset(h5)

        # 1. raw decode rate
        for _ in range(args.epochs):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(args.num_workers) as pool:
                for _ in pool.map(ds.__getitem__, range(args.entries)):
                    pass
            decode = args.entries / (time.perf_counter() - t0)
        print(json.dumps({"stage": "hdf5_decode",
                          "examples_per_sec": round(decode, 1),
                          "workers": args.num_workers}), flush=True)

        # 2. loader drain (collate + device_put, no consumer work)
        loader = PrefetchLoader(ds, batch_size=args.batch_size,
                                num_workers=args.num_workers)
        for _ in range(args.epochs):
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["mask"].shape[0]
            drain = n / (time.perf_counter() - t0)
        print(json.dumps({"stage": "loader_drain",
                          "examples_per_sec": round(drain, 1),
                          "batch_size": args.batch_size}), flush=True)

        # 2b. packed (decode-once) path
        from pmhc_tpu.data import PackedDataset

        t0 = time.perf_counter()
        packed = PackedDataset(h5, num_workers=args.num_workers)
        pack_s = time.perf_counter() - t0
        print(json.dumps({
            "stage": "pack", "pack_s": round(pack_s, 1),
            "pack_entries_per_sec": round(args.entries / pack_s, 1),
            "ram_mb": round(packed.nbytes / 1e6, 1),
        }), flush=True)

        ploader = PrefetchLoader(packed, batch_size=args.batch_size,
                                 num_workers=args.num_workers)
        for _ in range(args.epochs):
            n = 0
            t0 = time.perf_counter()
            for batch in ploader:
                n += batch["mask"].shape[0]
            pdrain = n / (time.perf_counter() - t0)
        print(json.dumps({"stage": "packed_loader_drain",
                          "examples_per_sec": round(pdrain, 1),
                          "batch_size": args.batch_size}), flush=True)

        # 2c. device-resident path (upload once, gather on device)
        from pmhc_tpu.data import DeviceDataset

        t0 = time.perf_counter()
        dev = DeviceDataset(packed)
        upload_s = time.perf_counter() - t0
        dloader = PrefetchLoader(dev, batch_size=args.batch_size,
                                 num_workers=args.num_workers)
        for _ in range(args.epochs):
            n = 0
            t0 = time.perf_counter()
            last = None
            for batch in dloader:
                n += batch["mask"].shape[0]
                last = batch
            # device fetch barrier on the final gather
            import numpy as _np

            _np.asarray(last["frames"])
            ddrain = n / (time.perf_counter() - t0)
        print(json.dumps({"stage": "device_loader_drain",
                          "examples_per_sec": round(ddrain, 1),
                          "upload_once_s": round(upload_s, 2),
                          "batch_size": args.batch_size}), flush=True)
        ploader = dloader  # the no-starvation stage uses the best path

        # 3. no-starvation: consumer emulates the device step duration
        step_s = args.batch_size / args.device_examples_per_sec
        n = 0
        stalls = 0.0
        t0 = time.perf_counter()
        it = iter(ploader)
        while True:
            t_wait = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                break
            stalls += time.perf_counter() - t_wait
            n += batch["mask"].shape[0]
            time.sleep(step_s)  # emulated device compute
        total = time.perf_counter() - t0
        print(json.dumps({
            "stage": "with_emulated_device",
            "device_examples_per_sec": args.device_examples_per_sec,
            "achieved_examples_per_sec": round(n / total, 1),
            "loader_stall_pct": round(100 * stalls / total, 2),
            "starved": bool(stalls / total > 0.05),
        }), flush=True)


if __name__ == "__main__":
    main()
