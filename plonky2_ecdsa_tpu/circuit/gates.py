"""Gate inventory: constraint systems for the TPU-native circuit IR.

Design stance (SURVEY.md §7): wide fused gates instead of the reference's
per-UX-op rows, so each nonnative operation costs 1 row plus shared
range-check rows.  Key parity points with the reference:

  * MulNonNativeGate fuses the reference's MulNonnativeGate + CheckSumGate pair
    (src/gates/mul_nonnative.rs:26-478) into one row: the 17-limb carry-free
    convolution constraints and the base-2^29 carry chain (carries offset by
    2^33, externally range-checked to (0, 2^34)) are combined by eliminating
    the intermediate check_sum wires:
        conv_i(x,y,q,r) + (b_{i-1} - 2^33) - 2^29 (b_i - 2^33) = 0
    Same soundness statement (x*y = q*m + r limbwise after carries), half the
    rows, 17 degree-2 constraints.
  * Range checks use base-4 decompositions packed many-values-per-row
    (plonky2_ux range_check_ux_circuit equivalent; SURVEY.md §2.10).
  * Selectors are boolean per-gate-instance fixed polynomials.

Every gate's `eval` is written once against an algebra adapter and runs
vectorized over the LDE coset (prover) or at zeta in GF(p^2) (verifier) —
the reference's eval_unfiltered / eval_unfiltered_circuit duality.
"""

from __future__ import annotations

from .foreign import BITS, ForeignField

CARRY_OFFSET = 1 << 33  # CheckSum carry offset (mul_nonnative.rs:373,414)
CARRY_BITS = 34         # external carry range (0, 2^34) (nonnative.rs:453)


class Gate:
    """Base class. Subclasses define wire layout + constraints.

    Wires with index < num_routed (config) participate in copy constraints;
    each gate places its connectable wires first.
    """

    def gate_id(self) -> str:
        raise NotImplementedError

    @property
    def num_wires(self) -> int:
        raise NotImplementedError

    @property
    def num_constraints(self) -> int:
        raise NotImplementedError

    @property
    def degree(self) -> int:
        raise NotImplementedError

    def eval(self, alg, wires, consts, ctx):
        """Return list of constraint values (algebra elements)."""
        raise NotImplementedError

    def __repr__(self):
        return self.gate_id()


class NoopGate(Gate):
    def gate_id(self):
        return "Noop"

    num_wires = 0
    num_constraints = 0
    degree = 0

    def eval(self, alg, wires, consts, ctx):
        return []


class ConstantGate(Gate):
    """Exposes the row's constant-column values as routed wires.

    plonky2 ConstantGate equivalent (needed by constant_biguint etc.,
    src/gadgets/biguint.rs:165-175)."""

    def __init__(self, num_consts: int):
        self.num_consts = num_consts

    def gate_id(self):
        return f"Constant({self.num_consts})"

    @property
    def num_wires(self):
        return self.num_consts

    @property
    def num_constraints(self):
        return self.num_consts

    degree = 1

    def eval(self, alg, wires, consts, ctx):
        return [alg.sub(wires[i], consts[i]) for i in range(self.num_consts)]


class PublicInputGate(Gate):
    """K routed wires constrained to equal the public-input polynomials
    PI_j(x) (standard-PLONK public input binding: the verifier evaluates
    PI_j(zeta) = sum_i pi_{j,i} * L_{row_i}(zeta) itself; no in-circuit hash
    needed).  Fills the role of plonky2's PublicInputGate."""

    def __init__(self, num_cols: int = 8):
        self.num_cols = num_cols

    def gate_id(self):
        return f"PublicInput({self.num_cols})"

    @property
    def num_wires(self):
        return self.num_cols

    @property
    def num_constraints(self):
        return self.num_cols

    degree = 1

    def eval(self, alg, wires, consts, ctx):
        pis = ctx["pi_vals"]  # num_cols algebra elements (PI_j at the point(s))
        return [alg.sub(wires[i], pis[i]) for i in range(self.num_cols)]


class ArithmeticGate(Gate):
    """num_ops independent ops: out = c0 * m1 * m2 + c1 * addend.

    plonky2 ArithmeticGate equivalent — backs mul/add/sub/mul_add/bool logic
    (used via split recombination, src/gadgets/split_nonnative.rs:38-47, etc.).
    c0, c1 are the row's two constant-column values (shared by all ops)."""

    WIRES_PER_OP = 4  # m1, m2, addend, out

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    def gate_id(self):
        return f"Arithmetic({self.num_ops})"

    @property
    def num_wires(self):
        return self.num_ops * self.WIRES_PER_OP

    @property
    def num_constraints(self):
        return self.num_ops

    degree = 3  # c0 (committed poly) * wire * wire

    def wires_op(self, i):
        b = i * self.WIRES_PER_OP
        return b, b + 1, b + 2, b + 3  # m1, m2, addend, out

    def eval(self, alg, wires, consts, ctx):
        c0, c1 = consts[0], consts[1]
        out = []
        for i in range(self.num_ops):
            m1, m2, ad, o = self.wires_op(i)
            t = alg.mul(c0, alg.mul(wires[m1], wires[m2]))
            t = alg.add(t, alg.mul(c1, wires[ad]))
            out.append(alg.sub(t, wires[o]))
        return out


class BaseSum2Gate(Gate):
    """num_ops values decomposed into `bits` little-endian binary bits.

    Equivalent of plonky2's split_le_base::<2> rows used by
    split_nonnative_to_bits (src/gadgets/nonnative.rs:566-582) and the 2/4-bit
    digit splits (src/gadgets/split_nonnative.rs:25-72).  The bit wires are
    routed (digit recombination consumes them)."""

    def __init__(self, num_ops: int, bits: int = BITS):
        self.num_ops = num_ops
        self.bits = bits

    def gate_id(self):
        return f"BaseSum2({self.num_ops},{self.bits})"

    @property
    def num_wires(self):
        return self.num_ops * (1 + self.bits)

    @property
    def num_constraints(self):
        return self.num_ops * (1 + self.bits)

    degree = 2

    def wire_value(self, op):
        return op * (1 + self.bits)

    def wire_bit(self, op, j):
        return op * (1 + self.bits) + 1 + j

    def eval(self, alg, wires, consts, ctx):
        out = []
        for op in range(self.num_ops):
            acc = alg.zero()
            for j in reversed(range(self.bits)):
                b = wires[self.wire_bit(op, j)]
                acc = alg.add(alg.mul_const(acc, 2), b)
                # booleanity appended after recomposition below
            out.append(alg.sub(acc, wires[self.wire_value(op)]))
            for j in range(self.bits):
                b = wires[self.wire_bit(op, j)]
                out.append(alg.mul(b, alg.add_const(b, -1)))
        return out


class RangeCheckGate(Gate):
    """num_vals values each constrained < 2^bits via non-routed base-4 limbs.

    Pool-packed: the builder accumulates pending range checks (from nonnative
    muls/adds, cmp diffs, mul carries...) and flushes them V-per-row.
    Equivalent of plonky2_ux's range_check_ux_circuit at BITS=29 and 34
    (src/gadgets/nonnative.rs:453-460)."""

    def __init__(self, bits: int, num_vals: int):
        self.bits = bits
        self.num_vals = num_vals
        self.num_limbs = -(-bits // 2)
        self.top_base = 4 if bits % 2 == 0 else 2

    def gate_id(self):
        return f"RangeCheck({self.bits},{self.num_vals})"

    @property
    def num_wires(self):
        return self.num_vals * (1 + self.num_limbs)

    @property
    def num_constraints(self):
        return self.num_vals * (1 + self.num_limbs)

    degree = 4

    def wire_value(self, v):
        return v

    def wire_limb(self, v, j):
        return self.num_vals + v * self.num_limbs + j

    def eval(self, alg, wires, consts, ctx):
        out = []
        for v in range(self.num_vals):
            acc = alg.zero()
            for j in reversed(range(self.num_limbs)):
                acc = alg.mul_const(acc, 4)
                acc = alg.add(acc, wires[self.wire_limb(v, j)])
            out.append(alg.sub(acc, wires[self.wire_value(v)]))
            for j in range(self.num_limbs):
                l = wires[self.wire_limb(v, j)]
                base = self.top_base if j == self.num_limbs - 1 else 4
                c = alg.mul(l, alg.add_const(l, -1))
                if base == 4:
                    c = alg.mul(c, alg.add_const(l, -2))
                    c = alg.mul(c, alg.add_const(l, -3))
                out.append(c)
        return out


class MulNonNativeGate(Gate):
    """Fused nonnative modular multiplication: x*y = q*m + r in 9x29-bit limbs.

    See module docstring; reference: src/gates/mul_nonnative.rs (MulNonnative
    53 wires + CheckSum 33 wires, 17+17 deg-2 constraints) fused to 52 wires /
    17 deg-2 constraints by eliminating check_sum.  External obligations
    (performed by the mul_nonnative gadget): x, y, q, r limbs < 2^29;
    b carries < 2^34."""

    N = 9

    def __init__(self, ff: ForeignField):
        self.ff = ff

    def gate_id(self):
        return f"MulNonNative({self.ff.name})"

    @property
    def num_wires(self):
        return 4 * self.N + (2 * self.N - 2)  # x,y,r,q + 16 carries

    @property
    def num_constraints(self):
        return 2 * self.N - 1

    degree = 2

    def wire_x(self, i):
        return i

    def wire_y(self, i):
        return self.N + i

    def wire_r(self, i):
        return 2 * self.N + i

    def wire_q(self, i):
        return 3 * self.N + i

    def wire_b(self, i):
        return 4 * self.N + i

    def eval(self, alg, wires, consts, ctx):
        N = self.N
        m = self.ff.limbs29
        out = []
        prev = None  # (b_{i-1} - OFF)
        for i in range(2 * N - 1):
            lo = max(i - N + 1, 0)
            hi = min(i + 1, N)
            acc = alg.zero()
            for j in range(lo, hi):
                qm = alg.mul_const(wires[self.wire_q(i - j)], m[j])
                xy = alg.mul(wires[self.wire_x(j)], wires[self.wire_y(i - j)])
                acc = alg.add(acc, alg.sub(qm, xy))
            if i < N:
                acc = alg.add(acc, wires[self.wire_r(i)])
            if prev is not None:
                acc = alg.add(acc, prev)
            if i < 2 * N - 2:
                cur = alg.add_const(wires[self.wire_b(i)], -CARRY_OFFSET)
                out.append(alg.sub(acc, alg.mul_const(cur, 1 << BITS)))
                prev = cur
            else:
                out.append(acc)
        return out


class NonNativeAddGate(Gate):
    """a + b = s + ovf*m limbwise with in-gate {0,1,2} carries.

    Replaces the reference's hint+check add_nonnative row chain
    (src/gadgets/nonnative.rs:245-276): same statement (sum + overflow bool,
    sum limbs externally range-checked; cmp vs modulus separate)."""

    N = 9

    def __init__(self, ff: ForeignField):
        self.ff = ff

    def gate_id(self):
        return f"NonNativeAdd({self.ff.name})"

    @property
    def num_wires(self):
        return 3 * self.N + 1 + (self.N - 1)

    @property
    def num_constraints(self):
        return self.N + 1 + (self.N - 1)

    degree = 3

    def wire_a(self, i):
        return i

    def wire_b(self, i):
        return self.N + i

    def wire_s(self, i):
        return 2 * self.N + i

    @property
    def wire_ovf(self):
        return 3 * self.N

    def wire_c(self, i):
        return 3 * self.N + 1 + i

    def eval(self, alg, wires, consts, ctx):
        N = self.N
        m = self.ff.limbs29
        ovf = wires[self.wire_ovf]
        out = []
        prev = None
        for i in range(N):
            acc = alg.add(wires[self.wire_a(i)], wires[self.wire_b(i)])
            acc = alg.sub(acc, wires[self.wire_s(i)])
            acc = alg.sub(acc, alg.mul_const(ovf, m[i]))
            if prev is not None:
                acc = alg.add(acc, prev)
            if i < N - 1:
                cur = alg.add_const(wires[self.wire_c(i)], -1)  # carry in {-1,0,1}
                acc = alg.sub(acc, alg.mul_const(cur, 1 << BITS))
                prev = cur
            out.append(acc)
        out.append(alg.mul(ovf, alg.add_const(ovf, -1)))  # ovf boolean
        for i in range(N - 1):
            c = wires[self.wire_c(i)]
            t = alg.mul(c, alg.add_const(c, -1))
            out.append(alg.mul(t, alg.add_const(c, -2)))  # c' in {0,1,2}
        return out


class NonNativeSubGate(Gate):
    """d = a - b + ovf*m limbwise (reference sub_nonnative semantics,
    src/gadgets/nonnative.rs:356-388: a = d + b - ovf*m)."""

    N = 9

    def __init__(self, ff: ForeignField):
        self.ff = ff

    def gate_id(self):
        return f"NonNativeSub({self.ff.name})"

    @property
    def num_wires(self):
        return 3 * self.N + 1 + (self.N - 1)

    @property
    def num_constraints(self):
        return self.N + 1 + (self.N - 1)

    degree = 3

    def wire_a(self, i):
        return i

    def wire_b(self, i):
        return self.N + i

    def wire_d(self, i):
        return 2 * self.N + i

    @property
    def wire_ovf(self):
        return 3 * self.N

    def wire_c(self, i):
        return 3 * self.N + 1 + i

    def eval(self, alg, wires, consts, ctx):
        N = self.N
        m = self.ff.limbs29
        ovf = wires[self.wire_ovf]
        out = []
        prev = None
        for i in range(N):
            acc = alg.sub(wires[self.wire_a(i)], wires[self.wire_b(i)])
            acc = alg.add(acc, alg.mul_const(ovf, m[i]))
            acc = alg.sub(acc, wires[self.wire_d(i)])
            if prev is not None:
                acc = alg.add(acc, prev)
            if i < N - 1:
                cur = alg.add_const(wires[self.wire_c(i)], -1)
                acc = alg.sub(acc, alg.mul_const(cur, 1 << BITS))
                prev = cur
            out.append(acc)
        out.append(alg.mul(ovf, alg.add_const(ovf, -1)))
        for i in range(N - 1):
            c = wires[self.wire_c(i)]
            t = alg.mul(c, alg.add_const(c, -1))
            out.append(alg.mul(t, alg.add_const(c, -2)))
        return out


class NonNativeAddManyGate(Gate):
    """Sum of K 9-limb values = s + ovf*m; carries offset by 2^33 and
    externally range-checked (34-bit pool), ovf externally 29-bit checked —
    matching the loose overflow contract of the reference's add_many_nonnative
    (src/gadgets/nonnative.rs:310-353)."""

    N = 9

    def __init__(self, ff: ForeignField, k: int = 4):
        self.ff = ff
        self.k = k

    def gate_id(self):
        return f"NonNativeAddMany({self.ff.name},{self.k})"

    @property
    def num_wires(self):
        return self.k * self.N + self.N + 1 + (self.N - 1)

    @property
    def num_constraints(self):
        return self.N

    degree = 2

    def wire_a(self, t, i):
        return t * self.N + i

    def wire_s(self, i):
        return self.k * self.N + i

    @property
    def wire_ovf(self):
        return (self.k + 1) * self.N

    def wire_c(self, i):
        return (self.k + 1) * self.N + 1 + i

    def eval(self, alg, wires, consts, ctx):
        N = self.N
        m = self.ff.limbs29
        ovf = wires[self.wire_ovf]
        out = []
        prev = None
        for i in range(N):
            acc = alg.zero()
            for t in range(self.k):
                acc = alg.add(acc, wires[self.wire_a(t, i)])
            acc = alg.sub(acc, wires[self.wire_s(i)])
            acc = alg.sub(acc, alg.mul_const(ovf, m[i]))
            if prev is not None:
                acc = alg.add(acc, prev)
            if i < N - 1:
                cur = alg.add_const(wires[self.wire_c(i)], -CARRY_OFFSET)
                acc = alg.sub(acc, alg.mul_const(cur, 1 << BITS))
                prev = cur
            out.append(acc)
        return out


class BigCmpGate(Gate):
    """le = (a <= b) for two 9-limb values via borrow chain; diff limbs
    externally 29-bit range-checked.  Equivalent of plonky2_ux
    list_le_ux_circuit used by cmp_biguint (src/gadgets/biguint.rs:221-229)."""

    N = 9

    def __init__(self):
        pass

    def gate_id(self):
        return "BigCmp"

    @property
    def num_wires(self):
        return 2 * self.N + 1 + self.N + self.N  # a, b, le, d, brw

    @property
    def num_constraints(self):
        return self.N + self.N + 1

    degree = 2

    def wire_a(self, i):
        return i

    def wire_b(self, i):
        return self.N + i

    @property
    def wire_le(self):
        return 2 * self.N

    def wire_d(self, i):
        return 2 * self.N + 1 + i

    def wire_brw(self, i):
        return 3 * self.N + 1 + i

    def eval(self, alg, wires, consts, ctx):
        N = self.N
        out = []
        prev = None
        for i in range(N):
            # b_i - a_i - brw_{i-1} + 2^29*brw_i - d_i = 0
            acc = alg.sub(wires[self.wire_b(i)], wires[self.wire_a(i)])
            if prev is not None:
                acc = alg.sub(acc, prev)
            acc = alg.add(acc, alg.mul_const(wires[self.wire_brw(i)], 1 << BITS))
            acc = alg.sub(acc, wires[self.wire_d(i)])
            out.append(acc)
            prev = wires[self.wire_brw(i)]
        for i in range(N):
            b = wires[self.wire_brw(i)]
            out.append(alg.mul(b, alg.add_const(b, -1)))
        out.append(alg.sub(alg.add(wires[self.wire_le], wires[self.wire_brw(N - 1)]), alg.one()))
        return out


class RandomAccessGate(Gate):
    """num_copies independent 16-way selects: out = items[idx].

    plonky2 RandomAccessGate equivalent — the in-circuit gather primitive
    behind random_access_curve_points (src/gadgets/curve_windowed_mul.rs:74-118).
    idx is decomposed into `bits` in-gate bits; selection via iterated
    linear interpolation (degree bits+1)."""

    def __init__(self, bits: int = 4, num_copies: int = 4):
        self.bits = bits
        self.vec_size = 1 << bits
        self.num_copies = num_copies
        self._routed_per_copy = 2 + self.vec_size

    def gate_id(self):
        return f"RandomAccess({self.bits},{self.num_copies})"

    @property
    def num_wires(self):
        return self.num_copies * self._routed_per_copy + self.num_copies * self.bits

    @property
    def num_constraints(self):
        return self.num_copies * (self.bits + 2)

    @property
    def degree(self):
        return self.bits + 1

    def wire_idx(self, c):
        return c * self._routed_per_copy

    def wire_out(self, c):
        return c * self._routed_per_copy + 1

    def wire_item(self, c, i):
        return c * self._routed_per_copy + 2 + i

    def wire_bit(self, c, j):
        return self.num_copies * self._routed_per_copy + c * self.bits + j

    def eval(self, alg, wires, consts, ctx):
        out = []
        for c in range(self.num_copies):
            bits = [wires[self.wire_bit(c, j)] for j in range(self.bits)]
            for b in bits:
                out.append(alg.mul(b, alg.add_const(b, -1)))
            acc = alg.zero()
            for j in reversed(range(self.bits)):
                acc = alg.add(alg.mul_const(acc, 2), bits[j])
            out.append(alg.sub(acc, wires[self.wire_idx(c)]))
            items = [wires[self.wire_item(c, i)] for i in range(self.vec_size)]
            for b in bits:
                items = [
                    alg.add(items[2 * i], alg.mul(b, alg.sub(items[2 * i + 1], items[2 * i])))
                    for i in range(len(items) // 2)
                ]
            out.append(alg.sub(items[0], wires[self.wire_out(c)]))
        return out
