"""CLI front-end (parity with reference apple_hevc_batch.py:885-894).

    python -m hevc_tpu.cli -i INPUT_DIR -o OUTPUT_DIR
        [--debug] [--skip-validator] [--force-cpu] [--force-gpu]
        [--nvenc-hdr-mode {auto,prefer,disable}] [--workers N] [--qp N]
"""
from __future__ import annotations

import argparse
import logging
import sys
import threading


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="hevc_tpu",
        description="TPU-native Apple-compatible HEVC batch transcoder")
    p.add_argument("-i", "--input", required=True, help="input directory")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--skip-validator", action="store_true")
    p.add_argument("--force-cpu", action="store_true",
                   help="force the scalar robust path")
    p.add_argument("--force-gpu", "--force-tpu", dest="force_gpu",
                   action="store_true", help="force the TPU fast path")
    p.add_argument("--nvenc-hdr-mode", choices=["auto", "prefer", "disable"],
                   default="auto", help="HDR fast-path policy (parity flag)")
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--qp", type=int, default=None,
                   help="override the planned QP (constant-QP encode)")
    p.add_argument("--preset", choices=["p4", "p5", "p6", "p7",
                                    "fast", "medium", "slow",
                                    "ctb32"],
                   default=None, help="encoder preset (default: auto by "
                   "resolution/HDR, the reference's p4-p7 analogue)")
    p.add_argument("--resume", action="store_true",
                   help="skip complete outputs, resume partial encodes")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO,
                        format="[%(levelname)s] %(message)s")
    from hevc_tpu.batch.scheduler import batch_convert

    stop = threading.Event()
    try:
        results = batch_convert(
            args.input, args.output, max_workers=args.workers,
            stop_event=stop, debug=args.debug,
            skip_validator=args.skip_validator, force_cpu=args.force_cpu,
            force_gpu=args.force_gpu, nvenc_hdr_mode=args.nvenc_hdr_mode,
            qp_override=args.qp, preset=args.preset, resume=args.resume)
    except KeyboardInterrupt:
        stop.set()
        print("cancelled", file=sys.stderr)
        return 130
    n_ok = sum(r["status"] == "SUCCESS" for r in results)
    print(f"{n_ok}/{len(results)} succeeded; ledger written to "
          f"{args.output}/transcode_log.csv")
    return 0 if n_ok == len(results) and results else 1


if __name__ == "__main__":
    raise SystemExit(main())
