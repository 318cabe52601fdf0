"""CLI behavior tests (subprocess, host backend, tiny circuit)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIMPLE = "/root/reference/test/circuits/simple"
SRS = "/root/reference/keys/setup/setup_2^10.key"


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, "-m", "plonkit_tpu.cli", "--backend", "host"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300)


def test_cli_full_pipeline(tmp_path):
    d = str(tmp_path)
    r = run_cli(["analyse", "-c", f"{SIMPLE}/circuit.r1cs.json", "-o", "analyse.json"], d)
    assert r.returncode == 0, r.stderr
    stats = json.load(open(os.path.join(d, "analyse.json")))
    assert stats["num_gates"] == 3 and stats["num_hints"] == 2

    r = run_cli(["export-verification-key", "-m", SRS,
                 "-c", f"{SIMPLE}/circuit.r1cs.json", "-v", "vk.bin"], d)
    assert r.returncode == 0, r.stderr
    assert open(os.path.join(d, "vk.bin"), "rb").read() == \
        open(f"{SIMPLE}/vk.bin", "rb").read()

    r = run_cli(["prove", "-m", SRS, "-c", f"{SIMPLE}/circuit.r1cs.json",
                 "-w", f"{SIMPLE}/witness.json"], d)
    assert r.returncode == 0, r.stderr
    assert open(os.path.join(d, "proof.bin"), "rb").read() == \
        open(f"{SIMPLE}/proof.bin", "rb").read()
    pub = json.load(open(os.path.join(d, "public.json")))
    assert pub == ["35"]
    words = json.load(open(os.path.join(d, "proof.json")))
    assert len(words) == 33

    r = run_cli(["verify", "-p", "proof.bin", "-v", "vk.bin"], d)
    assert r.returncode == 0, r.stderr

    # no-clobber guard
    r = run_cli(["prove", "-m", SRS, "-c", f"{SIMPLE}/circuit.r1cs.json",
                 "-w", f"{SIMPLE}/witness.json"], d)
    assert r.returncode != 0

    # tampered proof -> exit 400
    blob = bytearray(open(os.path.join(d, "proof.bin"), "rb").read())
    blob[17] ^= 1  # flip a bit in the public input
    with open(os.path.join(d, "bad.bin"), "wb") as f:
        f.write(blob)
    r = run_cli(["verify", "-p", "bad.bin", "-v", "vk.bin"], d)
    # exit(400) truncates to 400 & 0xFF == 144 on POSIX (the reference's
    # std::process::exit(400) behaves identically)
    assert r.returncode == 400 % 256


def test_cli_generate_verifier(tmp_path):
    d = str(tmp_path)
    import shutil
    shutil.copy(f"{SIMPLE}/vk.bin", os.path.join(d, "vk.bin"))
    r = run_cli(["generate-verifier", "-v", "vk.bin", "-s", "verifier.sol"], d)
    assert r.returncode == 0, r.stderr
    sol = open(os.path.join(d, "verifier.sol")).read()
    assert "{{" not in sol, "unsubstituted placeholders"
    assert "verify_serialized_proof" in sol
    assert str(8) in sol  # domain size


def test_cli_setup_and_lagrange(tmp_path):
    d = str(tmp_path)
    r = run_cli(["setup", "-p", "10", "-m", "setup.key"], d)
    assert r.returncode == 0, r.stderr
    assert open(os.path.join(d, "setup.key"), "rb").read() == open(SRS, "rb").read(), \
        "dev SRS must be byte-identical to the reference crs_42"


def test_cli_lagrange_fast_path_byte_identical(tmp_path):
    """dump-lagrange + prove -l must produce the same bytes as the monomial
    path and the reference golden proof (mirrors the reference CI's
    monomial + lagrange prove steps in integration-test.yml)."""
    d = tmp_path
    r = run_cli(["dump-lagrange", "-m", SRS, "-l", "lagrange.key",
                 "-c", f"{SIMPLE}/circuit.r1cs.json"], d)
    assert r.returncode == 0, r.stderr
    r = run_cli(["prove", "-m", SRS, "-l", "lagrange.key",
                 "-c", f"{SIMPLE}/circuit.r1cs.json",
                 "-w", f"{SIMPLE}/witness.json", "-p", "proof.bin"], d)
    assert r.returncode == 0, r.stderr
    golden = open(f"{SIMPLE}/proof.bin", "rb").read()
    assert (d / "proof.bin").read_bytes() == golden


def test_cli_prove_from_binary_wtns(tmp_path):
    """.wtns binary witness ingestion (reference reader.rs:124-175) feeding
    the same byte-identical proof as the JSON witness."""
    import json
    from plonkit_tpu.frontend.witness import (load_witness_from_bin,
                                              write_witness_bin)
    with open(f"{SIMPLE}/witness.json") as f:
        values = [int(x) for x in json.load(f)]
    w = tmp_path / "witness.wtns"
    write_witness_bin(values, str(w))
    assert load_witness_from_bin(str(w)) == values
    r = run_cli(["prove", "-m", SRS, "-c", f"{SIMPLE}/circuit.r1cs.json",
                 "-w", str(w), "-p", "proof.bin"], tmp_path)
    assert r.returncode == 0, r.stderr
    golden = open(f"{SIMPLE}/proof.bin", "rb").read()
    assert (tmp_path / "proof.bin").read_bytes() == golden
