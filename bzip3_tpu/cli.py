"""bzip3-compatible command line interface.

Flag-for-flag parity with the reference CLI (src/main.c:553-585):
-e/-z encode, -d decode, -t test, -r recover, -c stdout, -f force,
--rm, -k keep, -v verbose, -V version, -b block-MiB, -B batch,
-j jobs.  Extension: --engine {auto,native,oracle,device,sharded,hybrid}
selects the compute backend (TPU pipeline vs native host runtime).

File handling mirrors the reference: encode appends ``.bz3``
(src/main.c:747-770), decode/test/recover require the suffix unless
writing to stdout, refuses tty output for compressed data
(src/main.c:161-165), and fsyncs real files on close
(src/main.c:115-142).
"""

from __future__ import annotations

import argparse
import os
import sys

from .container.bound import KiB, MiB, validate_block_size
from .container.stream import compress_file, decompress_file
from .engines import get_engine
from .errors import Bz3Error
from .version import __version__

SUFFIX = ".bz3"


def _open_output(path, force):
    if path is None:
        return sys.stdout.buffer
    if os.path.isdir(path):
        _die(f"output file `{path}' is a directory.")
    if os.path.exists(path) and not force:
        _die(f"output file `{path}' already exists. Use -f to force overwrite.")
    return open(path, "wb")


def _open_input(path):
    if path is None:
        return sys.stdin.buffer
    if os.path.isdir(path):
        _die(f"input `{path}' is a directory.")
    try:
        return open(path, "rb")
    except OSError as e:
        _die(f"failed to open input file `{path}': {e.strerror}")


def _die(msg, code=1):
    print(f"bzip3: {msg}", file=sys.stderr)
    sys.exit(code)


def _close(f, verbose=False):
    if f in (sys.stdout.buffer, sys.stdin.buffer):
        f.flush() if f is sys.stdout.buffer else None
        return
    if f.writable():
        f.flush()
        try:
            os.fsync(f.fileno())
        except OSError:
            pass
    f.close()


def _stats(mode, nread, nwritten, verbose):
    if not verbose:
        return
    if mode == "encode":
        ratio = 100.0 * nwritten / nread if nread else 0.0
        bpb = 8.0 * nwritten / nread if nread else 0.0
        print(
            f"{nread} -> {nwritten} bytes, {ratio:.2f}%, {bpb:.4f} bpb",
            file=sys.stderr,
        )
    else:
        print(f"{nread} -> {nwritten} bytes", file=sys.stderr)


def _process(inp, out, mode, block_size, engine, batch_size, verbose,
             recover=False, jobs_flag=0):
    def eng_batch_encode(blocks):
        return engine.encode_blocks(blocks, block_size)

    def batch_decode(pairs, bs):
        return engine.decode_blocks(pairs, bs)

    if mode == "encode":
        if out is not None and hasattr(out, "isatty") and out.isatty():
            _die("refusing to write compressed data to a terminal.")
        r, w = compress_file(
            inp,
            out,
            block_size,
            batch_encode=eng_batch_encode,
            batch_size=batch_size,
            # Framing quirk follows the USER'S -j (the reference's
            # single-thread vs pthread loop split), not our internal
            # batching width — see compress_file's feof_block doc.
            feof_block=jobs_flag >= 2,
        )
        _stats("encode", r, w, verbose)
    elif mode in ("decode", "recover"):
        r, w = decompress_file(
            inp,
            out,
            recover=(mode == "recover"),
            batch_decode=batch_decode,
            batch_size=batch_size,
        )
        _stats("decode", r, w, verbose)
    elif mode == "test":
        r, w = decompress_file(
            inp, None, test_only=True, batch_decode=batch_decode, batch_size=batch_size
        )
        if verbose:
            print("OK", file=sys.stderr)


def build_parser():
    p = argparse.ArgumentParser(
        prog="bzip3",
        add_help=False,
        description="bzip3 - better and stronger spiritual successor to bzip2 "
        "(TPU-native reimplementation).",
    )
    p.add_argument("-e", "-z", "--encode", dest="mode", action="store_const", const="encode")
    p.add_argument("-d", "--decode", dest="mode", action="store_const", const="decode")
    p.add_argument("-t", "--test", dest="mode", action="store_const", const="test")
    p.add_argument("-r", "--recover", dest="mode", action="store_const", const="recover")
    p.add_argument("-c", "--stdout", dest="force_stdstreams", action="store_true")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("--rm", dest="remove_input", action="store_true")
    p.add_argument("-k", "--keep", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-V", "--version", action="store_true")
    p.add_argument("-h", "--help", action="store_true")
    p.add_argument("-b", "--block", type=int, default=16, metavar="N")
    p.add_argument("-B", "--batch", action="store_true")
    p.add_argument("-j", "--jobs", type=int, default=0, metavar="N")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "native", "oracle", "device", "sharded", "hybrid"])
    p.add_argument("files", nargs="*")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.help:
        print(
            "bzip3 - better and stronger spiritual successor to bzip2.\n"
            "Usage: bzip3 [-e/-z/-d/-t/-c/-h/-V] [-b block_size] [-j jobs] files...\n"
            "Operations:\n"
            "  -e/-z, --encode   compress data (default)\n"
            "  -d, --decode      decompress data\n"
            "  -r, --recover     attempt at recovering corrupted data\n"
            "  -t, --test        verify validity of compressed data\n"
            "  -h, --help        display an usage overview\n"
            "  -f, --force      force overwriting output if it already exists\n"
            "      --rm          remove input files after successful (de)compression\n"
            "  -k, --keep        keep (don't delete) input files (default)\n"
            "  -v, --verbose     verbose mode (display more information)\n"
            "  -V, --version     display version information\n"
            "Extra flags:\n"
            "  -c, --stdout      force writing to standard output\n"
            "  -b N, --block=N   set block size in MiB {16}\n"
            "  -B, --batch       process all files specified as inputs\n"
            "  -j N, --jobs=N    set the amount of parallel threads\n"
            "  --engine=E        compute backend: auto|native|oracle|device|sharded|hybrid\n"
        )
        return 0
    if args.version:
        print(f"bzip3 {__version__} (bzip3_tpu, TPU-native reimplementation)")
        return 0

    mode = args.mode or "encode"
    block_size = args.block * MiB
    if not validate_block_size(block_size):
        _die("Block size must be between 65 KiB and 511 MiB.")

    engine = get_engine(args.engine, args.jobs)
    batch_size = max(1, args.jobs) if args.jobs else (os.cpu_count() or 4)

    files = args.files
    # Positional handling per the reference: in batch mode every file is
    # processed; otherwise up to [input] [output].
    jobs = []  # (input_path|None, output_path|None)
    if args.batch and files:
        for f in files:
            if mode == "encode":
                outname = None if args.force_stdstreams else f + SUFFIX
            elif mode in ("decode", "recover"):
                if args.force_stdstreams:
                    outname = None
                elif f.endswith(SUFFIX):
                    outname = f[: -len(SUFFIX)]
                else:
                    _die(f"input `{f}' does not have a {SUFFIX} suffix.")
            else:
                outname = None
            jobs.append((f, outname))
    else:
        f1 = files[0] if len(files) >= 1 else None
        f2 = files[1] if len(files) >= 2 else None
        if f2 is None and f1 is not None and not args.force_stdstreams:
            if mode == "encode":
                f2 = f1 + SUFFIX
            elif mode in ("decode", "recover"):
                if f1.endswith(SUFFIX):
                    f2 = f1[: -len(SUFFIX)]
                else:
                    # Reference refuses unknown extensions instead of
                    # silently dumping to stdout (src/main.c:783).
                    _die(f"input `{f1}' does not have a {SUFFIX} suffix.")
        if args.force_stdstreams:
            f2 = None
        jobs.append((f1, f2))

    status = 0
    for in_path, out_path in jobs:
        inp = _open_input(in_path)
        out = None
        if mode != "test":
            out = _open_output(out_path, args.force)
        job_ok = True
        try:
            _process(inp, out, mode, block_size, engine, batch_size,
                     args.verbose, jobs_flag=args.jobs)
        except Bz3Error as e:
            print(f"bzip3: {in_path or 'stdin'}: {e}", file=sys.stderr)
            status = 1
            job_ok = False
            if out is not None and out is not sys.stdout.buffer and out_path:
                out.close()
                os.unlink(out_path)
            continue
        finally:
            if inp is not sys.stdin.buffer:
                inp.close()
        if out is not None:
            _close(out)
        # --rm removes each input based on that file's own outcome (the
        # reference's per-file semantics, src/main.c:789), not the
        # cumulative exit status.
        if args.remove_input and in_path and not args.keep and job_ok:
            os.unlink(in_path)
    return status


if __name__ == "__main__":
    sys.exit(main())
