"""CLI entry points: prove / verify / bench / bls.

    python -m sipp_tpu.cli prove  --n 8 --out proof.npz
    python -m sipp_tpu.cli verify --proof proof.npz [--statement stmt.u32]
    python -m sipp_tpu.cli bls    --n 8
"""

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sipp_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prove", help="prove a random SIPP instance")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--out", type=str, default="proof.npz")

    v = sub.add_parser("verify", help="verify a saved proof")
    v.add_argument("--proof", type=str, default="proof.npz")
    v.add_argument("--statement", type=str, default=None,
                   help="also write the statement wire format here")

    b = sub.add_parser("bls", help="BLS aggregation demo")
    b.add_argument("--n", type=int, default=128)

    args = ap.parse_args(argv)

    if args.cmd == "prove":
        from .config import SippConfig
        from .utils.testing import random_instance
        from . import io

        cfg = SippConfig(n=args.n, num_devices=args.devices, seed=args.seed)
        a, b_ = random_instance(cfg.n, seed=cfg.seed)
        t0 = time.time()
        if cfg.num_devices > 1:
            from .parallel import make_mesh, sipp_prove_sharded

            proof = sipp_prove_sharded(a, b_, make_mesh(cfg.num_devices))
        else:
            from .protocol import sipp_prove

            proof = sipp_prove(a, b_)
        print(f"proved n={cfg.n} in {time.time()-t0:.2f}s", file=sys.stderr)
        io.save_proof(args.out, a, b_, proof)
        print(args.out)

    elif args.cmd == "verify":
        from . import io
        from .protocol import sipp_verify

        a, b_, proof = io.load_proof(args.proof)
        t0 = time.time()
        stmt = sipp_verify(a, b_, proof)
        print(f"verified n={a.shape[0]} in {time.time()-t0:.2f}s",
              file=sys.stderr)
        if args.statement:
            io.save_statement(args.statement, stmt)
            print(args.statement)
        print("OK")

    elif args.cmd == "bls":
        from .apps.bls_aggregation import main as bls_main

        bls_main(args.n)


if __name__ == "__main__":
    main()
