"""Circom witness generation: drives the compiler-emitted `.wasm` witness
calculator through the native C++ WASM interpreter (reference
`legogroth16/src/circom/{witness,wasm}.rs`, which embeds wasmer; here the
embedder is `crypto_tpu/native/wasm_interp.cpp`).

ABI (circom 2.x): init(sanity), getVersion, getFieldNumLen32, getRawPrime,
read/writeSharedRWMemory, setInputSignal(h_msb, h_lsb, pos) with the FNV-1a
hash of the input name, getWitnessSize, getWitness(i)."""

from __future__ import annotations

import ctypes

from ..curves import bls12_381 as bls
from ..fields.host import Field, Fp
from ..native import get_wasm_lib


class WitnessCalcError(Exception):
    pass


def fnv1a_64(name: str) -> tuple:
    """(msb32, lsb32) of the FNV-1a 64-bit hash (reference `fnv`)."""
    h = 0xcbf29ce484222325
    for b in name.encode():
        h ^= b
        h = (h * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF


class WitnessCalculator:
    def __init__(self, wasm_bytes: bytes, field: Field = None):
        self.field = field or bls.Fr
        lib = get_wasm_lib()
        if lib is None:
            raise WitnessCalcError("native WASM interpreter unavailable")
        self._lib = lib
        err = ctypes.create_string_buffer(256)
        self._inst = lib.wasm_load(wasm_bytes, len(wasm_bytes), err, 256)
        if not self._inst:
            raise WitnessCalcError(
                f"wasm load failed: {err.value.decode()}")
        version = self._call("getVersion")
        if version != 2:
            raise WitnessCalcError(f"unsupported circom version {version}")
        self.n32 = self._call("getFieldNumLen32")
        self._call("getRawPrime")
        prime = self._read_fr_int()
        if prime != self.field.p:
            raise WitnessCalcError("wasm prime != expected field modulus")

    @classmethod
    def from_file(cls, path: str, field: Field = None):
        with open(path, "rb") as f:
            return cls(f.read(), field)

    def __del__(self):
        if getattr(self, "_inst", None):
            self._lib.wasm_free(self._inst)
            self._inst = None

    def _call(self, name: str, *args) -> int:
        arr = (ctypes.c_int64 * max(len(args), 1))(*args)
        out = ctypes.c_int64(0)
        rc = self._lib.wasm_call(self._inst, name.encode(), arr, len(args),
                                 ctypes.byref(out))
        if rc == 1:
            raise WitnessCalcError(f"unknown wasm export {name}")
        if rc == 2:
            raise WitnessCalcError(
                f"wasm trap in {name}: "
                f"{self._lib.wasm_last_error(self._inst).decode()}")
        return out.value

    def _read_fr_int(self) -> int:
        v = 0
        for i in range(self.n32):
            v |= (self._call("readSharedRWMemory", i) & 0xFFFFFFFF) << (32 * i)
        return v

    def _write_fr(self, value: Fp):
        v = int(value)
        for i in range(self.n32):
            self._call("writeSharedRWMemory", i, (v >> (32 * i)) & 0xFFFFFFFF)

    def calculate_witnesses(self, inputs: dict,
                            sanity_check: bool = False) -> list:
        """inputs: {signal_name: [Fp values]}.  Returns the full wire
        assignment [1, publics..., privates...] as field elements."""
        self._call("init", 1 if sanity_check else 0)
        seen_inputs = 0
        for name, values in inputs.items():
            msb, lsb = fnv1a_64(name)
            for i, value in enumerate(values):
                self._write_fr(self.field(int(value)))
                self._call("setInputSignal", msb, lsb, i)
                seen_inputs += 1
            required = self._call("getInputSignalSize", msb, lsb)
            if required != len(values):
                raise WitnessCalcError(
                    f"signal {name}: expected {required} values, got "
                    f"{len(values)}")
        required_inputs = self._call("getInputSize")
        if required_inputs != seen_inputs:
            raise WitnessCalcError(
                f"expected {required_inputs} input signals, got "
                f"{seen_inputs}")
        wires = []
        for i in range(self._call("getWitnessSize")):
            self._call("getWitness", i)
            wires.append(self.field(self._read_fr_int()))
        return wires
