"""KB universal accumulator (reference
`vb_accumulator/src/kb_universal_accumulator/`, paper 2021/638): a universal
accumulator built from TWO positive VB accumulators — one accumulating the
members, one accumulating the non-members of a fixed domain.

Adding an element moves it from the non-membership accumulator to the
membership accumulator; removing does the reverse.  (Non)membership
witnesses are plain positive-accumulator membership witnesses in the
respective accumulator, so all the existing witness-update machinery and the
weak-BB-style CDH proofs apply unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..fields.host import Fp
from .core import (PositiveAccumulator, MembershipWitness, AccumulatorError)
from .persistence import InMemoryState
from .setup import AccumSecretKey, AccumPublicKey, AccumSetupParams

F = bls.Fr


@dataclass
class KBUniversalAccumulator:
    mem: PositiveAccumulator
    non_mem: PositiveAccumulator

    @classmethod
    def initialize(cls, params: AccumSetupParams, sk: AccumSecretKey,
                   domain, mem_state: InMemoryState,
                   non_mem_state: InMemoryState) -> "KBUniversalAccumulator":
        mem = PositiveAccumulator.initialize(params)
        non_mem = PositiveAccumulator.initialize(params)
        non_mem = non_mem.add_batch(list(domain), sk, non_mem_state)
        return cls(mem=mem, non_mem=non_mem)

    def extend_domain(self, new_elements, sk, non_mem_state):
        return KBUniversalAccumulator(
            mem=self.mem,
            non_mem=self.non_mem.add_batch(list(new_elements), sk, non_mem_state))

    def add(self, element: Fp, sk, mem_state, non_mem_state):
        if not non_mem_state.has(element):
            raise AccumulatorError("element not in domain or already added")
        return KBUniversalAccumulator(
            mem=self.mem.add(element, sk, mem_state),
            non_mem=self.non_mem.remove(element, sk, non_mem_state))

    def remove(self, element: Fp, sk, mem_state, non_mem_state):
        return KBUniversalAccumulator(
            mem=self.mem.remove(element, sk, mem_state),
            non_mem=self.non_mem.add(element, sk, non_mem_state))

    def add_batch(self, elements, sk, mem_state, non_mem_state):
        return KBUniversalAccumulator(
            mem=self.mem.add_batch(elements, sk, mem_state),
            non_mem=self.non_mem.remove_batch(elements, sk, non_mem_state))

    def remove_batch(self, elements, sk, mem_state, non_mem_state):
        """`accumulator.rs:127-148`."""
        return KBUniversalAccumulator(
            mem=self.mem.remove_batch(elements, sk, mem_state),
            non_mem=self.non_mem.add_batch(elements, sk, non_mem_state))

    def batch_updates(self, additions, removals, sk, mem_state,
                      non_mem_state):
        """Simultaneous additions+removals (`accumulator.rs:149-182`)."""
        return KBUniversalAccumulator(
            mem=self.mem.batch_updates(additions, removals, sk, mem_state),
            non_mem=self.non_mem.batch_updates(removals, additions, sk,
                                               non_mem_state))

    # -- value accessors (`accumulator.rs:248-266`) --

    def mem_value(self):
        return self.mem.value()

    def non_mem_value(self):
        return self.non_mem.value()

    def value(self):
        return (self.mem.value(), self.non_mem.value())

    # -- witnesses --

    def get_membership_witness(self, element, sk, mem_state) -> MembershipWitness:
        return self.mem.get_membership_witness(element, sk, mem_state)

    def get_non_membership_witness(self, element, sk, non_mem_state) -> MembershipWitness:
        return self.non_mem.get_membership_witness(element, sk, non_mem_state)

    def get_membership_witnesses_for_batch(self, elements, sk, mem_state):
        """`accumulator.rs:194-204`."""
        return [self.mem.get_membership_witness(e, sk, mem_state)
                for e in elements]

    def get_non_membership_witnesses_for_batch(self, elements, sk,
                                               non_mem_state):
        """`accumulator.rs:216-226`."""
        return [self.non_mem.get_membership_witness(e, sk, non_mem_state)
                for e in elements]

    def verify_membership(self, element, witness, pk: AccumPublicKey,
                          params: AccumSetupParams) -> bool:
        return self.mem.verify_membership(element, witness, pk, params)

    def verify_non_membership(self, element, witness, pk, params) -> bool:
        return self.non_mem.verify_membership(element, witness, pk, params)
