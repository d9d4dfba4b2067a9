"""Fortran-binding surface parity + compile gating (VERDICT r2 item 7).

1. The generated Fortran module must expose every public procedure name of
   the reference's pam_fortran_interface.F90 with the same call form
   (subroutine vs function) — so GCM glue written against the reference
   compiles unchanged.
2. When a Fortran compiler exists in the image, compile the module +
   native/fortran_test.F90 against the C registry and run it; otherwise
   skip with the environment reason (this image ships no gfortran —
   BASELINE.md).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

REF_F90 = "/root/reference/pam_core/pam_interface/pam_fortran_interface.F90"
OUR_F90 = os.path.join(REPO, "native", "pam_fortran_interface.F90")


def test_generated_f90_is_current():
    """The committed file must equal the generator's output."""
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "native",
                                      "generate_fortran_interface.py")],
        capture_output=True, text=True, check=True)
    committed = open(OUR_F90).read()
    assert gen.stdout == committed, \
        "native/pam_fortran_interface.F90 is stale — regenerate it"


@pytest.mark.skipif(not os.path.exists(REF_F90),
                    reason="reference tree not present")
def test_procedure_surface_parity():
    from check_fortran_surface import public_surface
    ref_g, ref_p = public_surface(REF_F90)
    our_g, our_p = public_surface(OUR_F90)
    helpers = {"string_c2f", "string_f2c"}
    missing = ((ref_g | set(ref_p)) - helpers) - \
        ((our_g | set(our_p)) - helpers)
    assert not missing, sorted(missing)
    mismatched = [n for n in (set(ref_p) & set(our_p)) - helpers
                  if ref_p[n] and our_p[n] and ref_p[n] != our_p[n]]
    assert not mismatched, mismatched


def _fortran_compiler():
    for fc in ("gfortran", "flang", "ifx", "ifort"):
        path = shutil.which(fc)
        if path:
            return path
    return None


@pytest.mark.skipif(_fortran_compiler() is None,
                    reason="no Fortran compiler in this image "
                           "(BASELINE.md environment constraint)")
def test_fortran_test_compiles_and_runs(tmp_path):
    from pam_tpu.interface import _build_and_load
    _build_and_load()                    # compiles the .so on demand
    so = os.path.join(REPO, "native", "libpam_interface.so")
    fc = _fortran_compiler()
    exe = tmp_path / "fortran_test"
    subprocess.run(
        [fc, "-o", str(exe), OUR_F90,
         os.path.join(REPO, "native", "fortran_test.F90"),
         so, "-Wl,-rpath," + os.path.dirname(so)],
        check=True, cwd=tmp_path)
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         check=True).stdout
    assert "CHECK option-string  p3" in out.replace("CHECK option-string p3",
                                                    "CHECK option-string  p3")
    assert "CHECK done" in out
    assert " F" in out.split("exists-after")[1].splitlines()[0]
    assert "240.0" in out or "240.00" in out  # grid-sum = 2*10*12
