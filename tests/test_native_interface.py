"""Native pam_interface (C++/ctypes) tests: zero-copy mirroring, options,
dirty tracking and validators (analog of standalone/mmf_simplified/
fortran_test.F90 exercised through the same C ABI)."""

import numpy as np
import pytest

from pam_tpu.interface import HostDataManager


@pytest.fixture()
def dm():
    d = HostDataManager()
    d.finalize()
    yield d
    d.finalize()


def test_mirror_zero_copy_roundtrip(dm):
    gcm = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    dm.mirror_array("state", gcm, "GCM state", readonly=False)
    view = dm.get("state")
    assert view.shape == (2, 3, 4)
    assert np.shares_memory(view, view)  # it is a view into the registry
    # mutate through the view; the GCM-owned array must see it (zero copy)
    view[1, 2, 3] = 99.0
    assert gcm[1, 2, 3] == 99.0
    # and vice versa
    gcm[0, 0, 0] = -5.0
    assert dm.get("state")[0, 0, 0] == -5.0


def test_readonly_flag(dm):
    gcm = np.ones(5)
    dm.mirror_array("ro", gcm, readonly=True)
    v = dm.get("ro")
    assert not v.flags.writeable


def test_register_allocate_and_dims(dm):
    dm.register_and_allocate("work", (4, 5), np.float64)
    a = dm.get("work")
    assert a.shape == (4, 5)
    assert (a == 0).all()
    assert dm.exists("work")
    dm.unregister("work")
    assert not dm.exists("work")
    dm.register_dimension("z", 50)
    assert dm.get_dimension_size("z") == 50
    assert dm.get_dimension_size("nope") == -1


def test_options(dm):
    dm.set_option("crm_dt", 20.0)
    dm.set_option("nens", 4)
    dm.set_option("micro", "p3")
    dm.set_option("adv", True)
    assert dm.get_option_float("crm_dt") == 20.0
    assert dm.get_option_int("nens") == 4
    assert dm.get_option_str("micro") == "p3"
    assert dm.get_option_bool("adv") is True
    assert dm.option_is_set("crm_dt")
    dm.remove_option("crm_dt")
    assert not dm.option_is_set("crm_dt")
    # int options are 64-bit end-to-end (ctypes argtypes + the int64
    # native setter; a plain C int would silently truncate)
    dm.set_option("seed", 2**35 + 7)
    assert dm.get_option_int("seed") == 2**35 + 7
    # int promotes to float on request (GCM configs store dt as int)
    assert dm.get_option_float("seed") == float(2**35 + 7)
    # missing/wrong-typed lookups raise in PYTHON (a C++ throw across the
    # ctypes boundary would std::terminate the process)
    with pytest.raises(KeyError):
        dm.get_option_int("no_such_option")
    with pytest.raises(TypeError):
        dm.get_option_int("micro")       # holds a string
    with pytest.raises(TypeError):
        dm.get_option_str("adv")         # holds a bool


def test_mirror_rejects_noncontiguous_and_unsupported(dm):
    """mirror_array aliases caller memory: a silent contiguous COPY would
    break the zero-copy contract (writes landing in a hidden buffer), and
    numpy's default int64 has no registry dtype — both must fail loudly."""
    big = np.zeros((4, 8))
    with pytest.raises(ValueError, match="contiguous"):
        dm.mirror_array("stride", big[:, ::2], readonly=False)
    with pytest.raises(TypeError, match="int64"):
        dm.mirror_array("ints", np.arange(4), readonly=False)
    with pytest.raises(TypeError, match="unsupported"):
        dm.register_and_allocate("h", (2, 2), dtype=np.int64)


def test_validators_and_dirty(dm):
    a = np.array([1.0, -2.0, np.nan, np.inf])
    dm.mirror_array("v", a, readonly=False)
    assert dm.validate("v", nan=True, inf=False, pos=False) == 1
    assert dm.validate("v", nan=True, inf=True, pos=False) == 2
    assert dm.validate("v", nan=True, inf=True, pos=True) == 3
    dm.clean_all_entries()
    assert not dm.entry_dirty("v")
    _ = dm.get("v")
    assert dm.entry_dirty("v")


def test_fortran_bindings_generate():
    """The generated Fortran module references exactly the exported C
    symbols (no gfortran in the image; symbol-level check instead)."""
    import subprocess, re, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "generate_fortran_interface.py")
    code = subprocess.run(["python3", src], capture_output=True, text=True,
                          check=True).stdout
    assert "module pam_fortran_interface" in code
    bound = set(re.findall(r"bind\(C, name='([a-z_0-9]+)'\)", code))
    so = os.path.join(root, "native", "libpam_interface.so")
    syms = subprocess.run(["nm", "-D", so], capture_output=True,
                          text=True).stdout
    exported = set(re.findall(r" T (pam_interface_\w+)", syms))
    missing = bound - exported
    assert not missing, missing


def test_c_abi_driver_full_surface(tmp_path):
    """Compile + run the C ABI driver (native/abi_test.c) — the analog of
    the reference's fortran_test.F90, exercising the extern "C" surface the
    generated Fortran bindings call (no Fortran compiler in this image)."""
    import os
    import subprocess
    from pam_tpu import interface as iface
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    iface._build_and_load()
    so = os.path.join(root, "native", "libpam_interface.so")
    src = os.path.join(root, "native", "abi_test.c")
    exe = str(tmp_path / "abi_test")
    subprocess.run(["g++", "-O1", src, so, "-o", exe,
                    f"-Wl,-rpath,{os.path.dirname(so)}"], check=True)
    out = subprocess.run([exe], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr + out.stdout
    assert "ALL OK" in out.stdout


def test_fortran_bindings_generation_parity():
    """The generated pam_fortran_interface.F90 must be current (re-running
    the generator reproduces it) and expose the reference surface families
    over 4 types x ranks 1-7 (ref: pam_fortran_interface.F90, 105
    procedures)."""
    import os
    import re
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gen = subprocess.run(
        [sys.executable, os.path.join(root, "native",
                                      "generate_fortran_interface.py")],
        capture_output=True, text=True, check=True).stdout
    on_disk = open(os.path.join(root, "native",
                                "pam_fortran_interface.F90")).read()
    assert gen == on_disk, "regenerate native/pam_fortran_interface.F90"
    names = set(re.findall(r"(?:subroutine|function) (pam_[a-z_0-9]+)", gen))
    for fam in ("pam_mirror_array_readonly_double_7d",
                "pam_mirror_array_readwrite_logical_1d",
                "pam_get_array_float_4d", "pam_create_array_integer",
                "pam_destroy_array", "pam_array_exists",
                "pam_make_readonly", "pam_set_option_string",
                "pam_get_option_stringlen", "pam_option_exists",
                "pam_register_dimension", "pam_get_dimension_size",
                "pam_finalize"):
        assert fam in names, fam
    n_procs = len(re.findall(r"^  (?:subroutine|function) pam_", gen,
                             re.MULTILINE))
    assert n_procs >= 100, n_procs  # reference: 105 definitions
