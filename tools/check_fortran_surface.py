"""Fortran-binding surface parity check (VERDICT r2 item 7).

Compares the PUBLIC procedure surface of the generated Fortran bindings
(native/pam_fortran_interface.F90) against the reference's
(pam_core/pam_interface/pam_fortran_interface.F90): the generic interface
names and the module procedures a GCM's Fortran glue can call. The
private bind(C) shim declarations are intentionally excluded — their
names are an internal contract between each file and its own C++ side
(ours: native/pam_interface.cpp; reference: pam_interface_extern_c.cpp).

Usage: python tools/check_fortran_surface.py [--ref <path>] [--ours <path>]
Exits non-zero if any reference-public name is missing.
"""

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_REF = "/root/reference/pam_core/pam_interface/pam_fortran_interface.F90"
DEFAULT_OURS = os.path.join(REPO, "native", "pam_fortran_interface.F90")


def public_surface(path):
    """Extract (generic_interface_names, {procedure: kind}) from an F90
    module, ignoring bind(C) shim declarations inside anonymous
    ``interface`` blocks. kind is 'subroutine' or 'function' — a caller
    written against the reference uses ``call name(...)`` vs
    ``x = name(...)``, so the kind is part of the API contract."""
    text = open(path).read()
    generics = set()
    procs = {}
    in_anon_interface = 0
    for line in text.splitlines():
        ls = line.strip().lower()
        m = re.match(r"interface\s+([a-z0-9_]+)", ls)
        if m:
            generics.add(m.group(1))
            continue
        if ls == "interface":           # anonymous block: bind(C) shims
            in_anon_interface += 1
            continue
        if ls.startswith("end interface"):
            in_anon_interface = max(0, in_anon_interface - 1)
            continue
        if in_anon_interface:
            continue
        if ls.startswith("end"):
            continue
        m = re.match(r"(?:recursive\s+)?subroutine\s+([a-z0-9_]+)", ls)
        if m:
            procs[m.group(1)] = "subroutine"
            continue
        m = re.match(r"(?:[a-z0-9_()=*,\s]+\s+)?function\s+([a-z0-9_]+)",
                     ls)
        if m:
            procs[m.group(1)] = "function"
            continue
        m = re.match(r"module procedure\s+(.*)", ls)
        if m:
            for name in m.group(1).split(","):
                procs.setdefault(name.strip(), None)
    return generics, procs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=DEFAULT_REF)
    ap.add_argument("--ours", default=DEFAULT_OURS)
    args = ap.parse_args()

    ref_g, ref_p = public_surface(args.ref)
    our_g, our_p = public_surface(args.ours)
    # callable names: generic interfaces + specific module procedures.
    # string_c2f/string_f2c are string-marshalling helpers internal to each
    # file's own implementation, not GCM-facing API.
    helpers = {"string_c2f", "string_f2c"}
    ref_names = (ref_g | set(ref_p)) - helpers
    our_names = (our_g | set(our_p)) - helpers

    missing = sorted(ref_names - our_names)
    extra = sorted(our_names - ref_names)
    kind_mismatch = sorted(
        n for n in (set(ref_p) & set(our_p)) - helpers
        if ref_p[n] and our_p[n] and ref_p[n] != our_p[n])
    print(f"reference public names: {len(ref_names)} "
          f"(generics {len(ref_g)}, procedures {len(ref_p)})")
    print(f"ours:                   {len(our_names)} "
          f"(generics {len(our_g)}, procedures {len(our_p)})")
    if missing:
        print("\nMISSING (in reference, not in ours):")
        for n in missing:
            print("  " + n)
    if kind_mismatch:
        print("\nCALL-FORM MISMATCH (subroutine vs function):")
        for n in kind_mismatch:
            print(f"  {n}: reference {ref_p[n]}, ours {our_p[n]}")
    if extra:
        print("\nextra (ours only — additions are allowed):")
        for n in extra:
            print("  " + n)
    if missing or kind_mismatch:
        sys.exit(1)
    print("\nOK: every reference-public procedure name is covered with "
          "the same call form.")


if __name__ == "__main__":
    main()
