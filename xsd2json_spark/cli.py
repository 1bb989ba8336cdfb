"""xsd2json command line: convert an XSD file, URL, or stdin document to
an equivalent draft-04 JSON Schema on stdout.

CLI parity with the reference's lib-pl/cli.pl:4-128:

    python -m xsd2json_spark.cli [options] <path|url|->

    -i / --indentation N     indentation level, 0 = single-line (default 2)
    -s / --whitespace MODE   remove (default) | preserve — parse-option
                             parity flag; our parser always
                             whitespace-normalizes documentation text the
                             way the reference's default does
    -t / --trace             dump the compiled definitions/root to stderr
    -v / --version           print version information
    --debug-info             print version + runtime info
    -h / --help              usage

Exit codes: 0 on success, 1 on any error (matching cli.pl's halt(0/1)).
No arguments prints usage and exits 0, like the reference.
"""

from __future__ import annotations

import argparse
import json
import sys

from xsd2json_spark import __version__
from xsd2json_spark.spec.xsd_compiler import XsdCompiler

REFERENCE_COMPAT = "1.12.22"  # fnogatz/xsd2json version this CLI mirrors


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="xsd2json",
        description="convert a XSD file into equivalent JSON schema",
    )
    ap.add_argument("path", nargs="?", help="XSD file path, http(s) URL, or '-' for stdin")
    ap.add_argument("-i", "--indentation", type=int, default=2,
                    help="set indentation level; use 0 for single-line output")
    ap.add_argument("-s", "--whitespace", choices=["remove", "preserve"], default="remove",
                    help="whitespace handling (parse-option parity flag)")
    ap.add_argument("-t", "--trace", action="store_true",
                    help="run with activated tracing (dumps intermediates to stderr)")
    ap.add_argument("-v", "--version", action="store_true",
                    help="show xsd2json version information")
    ap.add_argument("--debug-info", action="store_true",
                    help="show information usually needed for debugging")
    return ap


def main(argv=None) -> int:
    ap = build_parser()
    args = ap.parse_args(argv)

    if args.version:
        print(f"xsd2json_spark {__version__} (xsd2json-compatible {REFERENCE_COMPAT})")
        return 0
    if args.debug_info:
        print(f"# xsd2json_spark\n{__version__}")
        print(f"# xsd2json compatibility\n{REFERENCE_COMPAT}")
        print(f"# python\n{sys.version.split()[0]}")
        return 0
    if not args.path:
        ap.print_help()
        return 0

    try:
        source = sys.stdin.read() if args.path == "-" else args.path
        compiler = XsdCompiler(source)
        schema = compiler.compile()
    except Exception as exc:  # parse errors, IO errors, bad includes
        print(f"xsd2json: error: {exc}", file=sys.stderr)
        return 1

    if args.trace:
        print("# trace: definitions", file=sys.stderr)
        for name, body in compiler.definitions.items():
            print(f"#   {name}: {json.dumps(body, sort_keys=True)}", file=sys.stderr)

    indent = args.indentation if args.indentation > 0 else None
    print(json.dumps(schema, indent=indent, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
