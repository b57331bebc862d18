"""Test-grade CHP stabilizer simulator (Aaronson-Gottesman tableau).

NEVER on a production path: this is the independent oracle that the
circuit-level machinery (:mod:`..codes.circuit`) is checked against.
The Pauli-frame engine there *assumes* every detector/observable is
deterministic in the noiseless circuit; this simulator actually tracks
the full stabilizer state, so tests can (a) verify that determinism,
and (b) inject single Pauli faults as real gates and compare the
flipped detectors against the frame-propagated DEM footprints —
exactness of the model, measured, not asserted.

Standard tableau: rows 0..n-1 destabilizers, n..2n-1 stabilizers, each
an n-qubit Pauli (x, z bit rows) with a sign bit; H/CX/measure-Z
follow Aaronson & Gottesman, "Improved simulation of stabilizer
circuits" (PRA 70, 052328), Table I / section III.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TableauSimulator", "run_circuit"]


class TableauSimulator:
    def __init__(self, n: int, rng=None):
        self.n = n
        self.x = np.zeros((2 * n, n), bool)
        self.z = np.zeros((2 * n, n), bool)
        self.r = np.zeros(2 * n, bool)
        self.x[np.arange(n), np.arange(n)] = True        # destabilizers X_i
        self.z[n + np.arange(n), np.arange(n)] = True    # stabilizers  Z_i
        self.rng = rng if rng is not None else np.random.default_rng(0)
        # persistent scratch row (row index 2n) for deterministic
        # measurements — avoids re-stacking the whole tableau per shot
        self.x = np.vstack([self.x, np.zeros(n, bool)])
        self.z = np.vstack([self.z, np.zeros(n, bool)])
        self.r = np.append(self.r, False)

    # -- gates ---------------------------------------------------------------

    def h(self, q: int):
        self.r ^= self.x[:, q] & self.z[:, q]
        t = self.x[:, q].copy()
        self.x[:, q] = self.z[:, q]
        self.z[:, q] = t

    def cx(self, c: int, t: int):
        self.r ^= self.x[:, c] & self.z[:, t] & (self.x[:, t] ^ self.z[:, c] ^ True)
        self.x[:, t] ^= self.x[:, c]
        self.z[:, c] ^= self.z[:, t]

    def pauli_x(self, q: int):
        self.r ^= self.z[:, q]

    def pauli_z(self, q: int):
        self.r ^= self.x[:, q]

    # -- row algebra (phase-exact Pauli multiplication) -----------------------

    def _rowmult_into(self, h: int, i: int):
        """row_h <- row_i * row_h with exact sign tracking."""
        x1, z1 = self.x[i], self.z[i]
        x2, z2 = self.x[h], self.z[h]
        # g-function summed over qubits: phase exponent of P1*P2 (mod 4)
        g = np.zeros(self.n, np.int8)
        # x1 z1 / x2 z2 case analysis (Aaronson-Gottesman g)
        m_x = x1 & ~z1
        g[m_x] = (z2[m_x].astype(np.int8) * (2 * x2[m_x].astype(np.int8) - 1))
        m_y = x1 & z1
        g[m_y] = (z2[m_y].astype(np.int8) - x2[m_y].astype(np.int8))
        m_z = ~x1 & z1
        g[m_z] = (x2[m_z].astype(np.int8) * (1 - 2 * z2[m_z].astype(np.int8)))
        tot = (2 * self.r[h].astype(int) + 2 * self.r[i].astype(int)
               + int(g.sum(dtype=np.int64))) % 4
        assert tot in (0, 2), "non-Hermitian product in rowmult"
        self.r[h] = tot == 2
        self.x[h] ^= x1
        self.z[h] ^= z1

    # -- measurement -----------------------------------------------------------

    def measure_z(self, q: int) -> tuple[int, bool]:
        """Measure Z on qubit ``q``.  Returns ``(outcome, deterministic)``."""
        n = self.n
        # rows n..2n-1 only: row 2n is the scratch row, never a stabilizer
        stab_anticommute = np.flatnonzero(self.x[n:2 * n, q])
        if stab_anticommute.size:
            p = n + int(stab_anticommute[0])
            for i in range(2 * n):
                if i != p and self.x[i, q]:
                    self._rowmult_into(i, p)
            # destabilizer takes the old stabilizer row
            self.x[p - n] = self.x[p]
            self.z[p - n] = self.z[p]
            self.r[p - n] = self.r[p]
            self.x[p] = False
            self.z[p] = False
            self.z[p, q] = True
            out = bool(self.rng.integers(2))
            self.r[p] = out
            return int(out), False
        # deterministic: accumulate stabilizer rows whose destabilizer
        # partner anticommutes with Z_q into the persistent scratch row
        h = 2 * n
        self.x[h] = False
        self.z[h] = False
        self.r[h] = False
        for i in range(n):
            if self.x[i, q]:
                self._rowmult_into(h, i + n)
        return int(bool(self.r[h])), True

    def reset_z(self, q: int):
        out, _ = self.measure_z(q)
        if out:
            self.pauli_x(q)


def run_circuit(circ, *, rng=None, inject=None):
    """Run a :class:`~..codes.circuit.StabilizerCircuit`'s NOISELESS ops
    in the tableau simulator (noise ops are skipped), optionally
    injecting explicit Pauli faults.

    ``inject`` is a list of ``(op_index, qubit, has_x, has_z)``: the
    Pauli is applied as real gates immediately AFTER op ``op_index``
    executes (matching the frame engine's convention that a noise op's
    fault acts at the noise op's position).

    Returns ``(measurements [M] uint8, det_values [D] uint8,
    obs_values [K] uint8, det_deterministic [D] bool)`` where
    ``det_deterministic`` marks detectors ALL of whose constituent
    measurements were deterministic (a sufficient, not necessary,
    condition — random constituents are validated statistically by the
    caller instead).
    """
    sim = TableauSimulator(circ.n_qubits, rng=rng)
    by_pos: dict[int, list] = {}
    for item in inject or []:
        by_pos.setdefault(item[0], []).append(item)
    meas = np.zeros(circ.n_meas, np.uint8)
    det_flags = np.zeros(circ.n_meas, bool)  # per-measurement determinism
    mi = 0
    for i, op in enumerate(circ.ops):
        kind = op[0]
        if kind == "H":
            for q in op[1]:
                sim.h(int(q))
        elif kind == "CX":
            for c, t in zip(op[1], op[2]):
                sim.cx(int(c), int(t))
        elif kind == "RZ":
            for q in op[1]:
                sim.reset_z(int(q))
        elif kind in ("MRZ", "MZ"):
            for q in op[1]:
                out, det = sim.measure_z(int(q))
                meas[mi] = out
                det_flags[mi] = det
                mi += 1
                if kind == "MRZ" and out:
                    sim.pauli_x(int(q))
        # noise ops are skipped (noiseless oracle)
        for (_, q, hx, hz) in by_pos.get(i, []):
            if hx:
                sim.pauli_x(int(q))
            if hz:
                sim.pauli_z(int(q))
    det_vals = np.array([np.bitwise_xor.reduce(meas[g]) if len(g) else 0
                         for g in circ.detectors], np.uint8)
    obs_vals = np.array([np.bitwise_xor.reduce(meas[g]) if len(g) else 0
                         for g in circ.observables], np.uint8)
    det_det = np.array([bool(det_flags[g].all()) if len(g) else True
                        for g in circ.detectors])
    return meas, det_vals, obs_vals, det_det
