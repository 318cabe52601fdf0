"""Binary .r1cs parser coverage (reference behavior: src/r1cs_file.rs — the
reference unit-tests its parser from an inline synthetic file at
src/r1cs_file.rs:157-253; this mirrors that strategy with equivalent
synthetic bytes built by struct-packing, plus the error paths)."""

import struct

import pytest

from plonkit_tpu.fields import FR_MODULUS, FR_MODULUS_LE_BYTES
from plonkit_tpu.frontend.r1cs import (R1CS, load_r1cs, load_r1cs_from_bin,
                                       write_r1cs_bin)


def _header(n_wires=7, n_pub_out=1, n_pub_in=2, n_prv_in=3, n_labels=1000,
            n_constraints=3, field_size=32, prime=None):
    h = struct.pack("<I", field_size)
    h += prime if prime is not None else FR_MODULUS_LE_BYTES
    h += struct.pack("<IIII", n_wires, n_pub_out, n_pub_in, n_prv_in)
    h += struct.pack("<Q", n_labels)
    h += struct.pack("<I", n_constraints)
    return h


def _lc(entries):
    out = struct.pack("<I", len(entries))
    for wire, coeff in entries:
        out += struct.pack("<I", wire) + coeff.to_bytes(32, "little")
    return out


# the reference sample's three constraints (src/r1cs_file.rs:178-198):
#   (3*w5 + 8*w6) * (2*w0 + 20*w2 + 12*w3) = (5*w0 + 7*w2)
#   (4*w1 + 8*w4 + 3*w5) * (44*w3 + 6*w6)  = ()
#   (4*w6) * (6*w0 + 11*w2 + 5*w3)         = (0x258*w6)
_CONSTRAINTS = (
    _lc([(5, 3), (6, 8)]) + _lc([(0, 2), (2, 20), (3, 12)]) + _lc([(0, 5), (2, 7)])
    + _lc([(1, 4), (4, 8), (5, 3)]) + _lc([(3, 44), (6, 6)]) + _lc([])
    + _lc([(6, 4)]) + _lc([(0, 6), (2, 11), (3, 5)]) + _lc([(6, 0x258)])
)
_WIREMAP = struct.pack("<7Q", 0, 3, 10, 11, 12, 15, 324)


def _file(sections=None, version=1, magic=b"r1cs"):
    if sections is None:
        sections = [(1, _header()), (2, _CONSTRAINTS), (3, _WIREMAP)]
    data = magic + struct.pack("<II", version, len(sections))
    for sec_type, payload in sections:
        data += struct.pack("<IQ", sec_type, len(payload)) + payload
    return data


def _parse(tmp_path, data, name="circuit.r1cs"):
    p = tmp_path / name
    p.write_bytes(data)
    return load_r1cs_from_bin(str(p))


def test_sample_file(tmp_path):
    """Field-for-field mirror of the reference's `sample` test
    (src/r1cs_file.rs:163-243)."""
    r = _parse(tmp_path, _file())
    # header: n_wires=7, 1 public output, 2 public inputs
    assert r.num_variables == 7
    assert r.num_inputs == 1 + 1 + 2
    assert r.num_aux == 7 - 4
    assert len(r.constraints) == 3
    a0, b0, c0 = r.constraints[0]
    assert len(a0) == 2 and a0[0] == (5, 3) and a0[1] == (6, 8)
    assert b0 == [(0, 2), (2, 20), (3, 12)]
    assert c0 == [(0, 5), (2, 7)]
    a1, b1, c1 = r.constraints[1]
    assert c1 == []  # empty C vector round-trips
    a2, b2, c2 = r.constraints[2]
    assert b2[0] == (0, 6)
    assert c2 == [(6, 0x258)]
    assert r.wire_mapping == [0, 3, 10, 11, 12, 15, 324]


def test_sections_out_of_order(tmp_path):
    """The section table is offset-scanned, so order must not matter
    (src/r1cs_file.rs:120-131)."""
    data = _file(sections=[(3, _WIREMAP), (2, _CONSTRAINTS), (1, _header())])
    r = _parse(tmp_path, data)
    assert r.num_variables == 7 and len(r.constraints) == 3


def test_bad_magic(tmp_path):
    with pytest.raises(ValueError, match="magic"):
        _parse(tmp_path, _file(magic=b"r2cs"))


def test_bad_version(tmp_path):
    with pytest.raises(ValueError, match="version"):
        _parse(tmp_path, _file(version=2))


def test_bad_field_size(tmp_path):
    sections = [(1, _header(field_size=31)), (2, _CONSTRAINTS), (3, _WIREMAP)]
    with pytest.raises(ValueError, match="32-byte"):
        _parse(tmp_path, _file(sections=sections))


def test_wrong_prime(tmp_path):
    """Non-BN254 prime is rejected (src/r1cs_file.rs:138)."""
    prime = (FR_MODULUS - 2).to_bytes(32, "little")
    sections = [(1, _header(prime=prime)), (2, _CONSTRAINTS), (3, _WIREMAP)]
    with pytest.raises(ValueError, match="bn256"):
        _parse(tmp_path, _file(sections=sections))


def test_truncated_header(tmp_path):
    """Header section shorter than 32 + field_size is invalid (the
    reference's test_reader_size_fail, src/r1cs_file.rs:246-252)."""
    short = _header()[:-4]
    sections = [(1, short), (2, _CONSTRAINTS), (3, _WIREMAP)]
    with pytest.raises(ValueError, match="header"):
        _parse(tmp_path, _file(sections=sections))


def test_wire0_must_map_to_zero(tmp_path):
    bad_map = struct.pack("<7Q", 5, 3, 10, 11, 12, 15, 324)
    sections = [(1, _header()), (2, _CONSTRAINTS), (3, bad_map)]
    with pytest.raises(ValueError, match="[Ww]ire 0"):
        _parse(tmp_path, _file(sections=sections))


def test_coeff_out_of_range(tmp_path):
    bad = _lc([(5, FR_MODULUS)]) + _lc([]) + _lc([])
    sections = [(1, _header(n_constraints=1)), (2, bad), (3, _WIREMAP)]
    with pytest.raises(ValueError, match="range"):
        _parse(tmp_path, _file(sections=sections))


def test_map_section_size_mismatch(tmp_path):
    sections = [(1, _header()), (2, _CONSTRAINTS), (3, _WIREMAP + b"\x00" * 8)]
    with pytest.raises(ValueError, match="map"):
        _parse(tmp_path, _file(sections=sections))


def test_autodetect_and_roundtrip(tmp_path):
    """write_r1cs_bin -> load_r1cs (extension autodetect, reader.rs:178-185)
    round-trips constraints and sizes."""
    r = R1CS(num_inputs=3, num_aux=2, num_variables=5,
             constraints=[([(1, 7)], [(2, 9)], [(4, FR_MODULUS - 1)])],
             wire_mapping=[0, 1, 2, 3, 4])
    p = tmp_path / "rt.r1cs"
    write_r1cs_bin(r, str(p))
    back = load_r1cs(str(p))
    assert back.num_variables == 5
    assert back.num_inputs == 3
    assert back.constraints == r.constraints
    assert back.wire_mapping == r.wire_mapping
