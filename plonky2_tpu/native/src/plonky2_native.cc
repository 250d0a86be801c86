// Native host runtime for plonky2_tpu.
//
// The TPU (JAX/XLA/Pallas) owns the bulk polynomial/hash math; this library
// owns the host side of the prover that is inherently scalar/sequential or
// latency-bound: Goldilocks vector arithmetic for the witness-generation
// engine, the Poseidon permutation used by the Fiat-Shamir challenger
// (reference iop/challenger.rs), the PoseidonGate witness kernel (reference
// gates/poseidon.rs generator), and keccak-f for KeccakGoldilocksConfig
// (reference hash/keccak.rs). All functions are exact duals of the numpy
// implementations in field/np_field.py / hash/poseidon.py and are covered by
// equivalence tests (tests/test_native.py).
//
// Built by plonky2_tpu/native/__init__.py with g++ -O3; the Poseidon constant
// tables are generated into poseidon_tables.inc from the Python protocol
// constants (hash/poseidon_constants.py, hash/poseidon_fast_partial.py) so
// the two sides can never diverge.

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;
using i64 = int64_t;

static const u64 P = 0xFFFFFFFF00000001ull;
static const u64 EPS = 0xFFFFFFFFull; // 2^64 mod p

static inline u64 gl_canon(u64 x) { return x >= P ? x - P : x; }

static inline u64 gadd(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += EPS;
  return gl_canon(s);
}

static inline u64 gsub(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= EPS; // wrapping, matches np_field.sub
  return d;
}

static inline u64 gl_reduce128(u128 x) {
  u64 lo = (u64)x, hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32, hi_lo = hi & EPS;
  u64 t0 = lo - hi_hi;
  if (lo < hi_hi) t0 -= EPS;
  u64 t1 = hi_lo * EPS;
  u64 t2 = t0 + t1;
  if (t2 < t1) t2 += EPS;
  return gl_canon(t2);
}

static inline u64 gmul(u64 a, u64 b) { return gl_reduce128((u128)a * b); }

static inline u64 gexp(u64 b, u64 e) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = gmul(r, b);
    b = gmul(b, b);
    e >>= 1;
  }
  return r;
}

static inline u64 ginv(u64 x) { return gexp(x, P - 2); }

extern "C" {

// ---------------------------------------------------------------------------
// Goldilocks vector ops (duals of field/np_field.py)
// ---------------------------------------------------------------------------

void gl_add(const u64* x, const u64* y, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gadd(x[i], y[i]);
}

void gl_sub(const u64* x, const u64* y, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gsub(x[i], y[i]);
}

void gl_mul(const u64* x, const u64* y, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gmul(x[i], y[i]);
}

void gl_neg(const u64* x, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = x[i] == 0 ? 0 : P - x[i];
}

void gl_mul_scalar(const u64* x, u64 c, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gmul(x[i], c);
}

// out = c0*(a*b) + c1*d  — the ArithmeticGate op (reference
// gates/arithmetic_base.rs), fused to one pass for the witness engine.
void gl_arith(const u64* c0, const u64* c1, const u64* a, const u64* b,
              const u64* d, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++)
    out[i] = gadd(gmul(c0[i], gmul(a[i], b[i])), gmul(c1[i], d[i]));
}

void gl_exp_u64(const u64* x, u64 e, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = gexp(x[i], e);
}

void gl_inverse(const u64* x, u64* out, i64 n) {
  for (i64 i = 0; i < n; i++) out[i] = x[i] == 0 ? 0 : ginv(x[i]);
}

// Montgomery batch inversion; zeros map to zero (the reference
// field/src/types.rs:133 asserts nonzero; callers here pre-filter).
void gl_batch_inverse(const u64* x, u64* out, i64 n) {
  // prefix products over nonzero entries
  u64 acc = 1;
  for (i64 i = 0; i < n; i++) {
    out[i] = acc; // product of nonzeros before i
    if (x[i] != 0) acc = gmul(acc, x[i]);
  }
  u64 inv = ginv(acc);
  for (i64 i = n - 1; i >= 0; i--) {
    if (x[i] == 0) {
      out[i] = 0;
    } else {
      u64 res = gmul(out[i], inv);
      inv = gmul(inv, x[i]);
      out[i] = res;
    }
  }
}

// ---------------------------------------------------------------------------
// Poseidon-Goldilocks permutation (dual of hash/poseidon.py::permute)
// ---------------------------------------------------------------------------

#include "poseidon_tables.inc"
// provides: PO_RC[360], PO_MDS[12][12] (small ints),
// PO_FAST_FIRST[12], PO_FAST_RC[22], PO_FAST_INIT[11][11],
// PO_FAST_W_HATS[22][11], PO_FAST_VS[22][11]

static const int PW = 12;
static const int HALF_FULL = 4;
static const int N_PARTIAL = 22;
static const int N_ROUNDS = 30;

static inline u64 sbox7(u64 x) {
  u64 x2 = gmul(x, x);
  u64 x3 = gmul(x2, x);
  u64 x6 = gmul(x3, x3);
  return gmul(x6, x);
}

static inline void mds_full(u64* s) {
  u64 r[PW];
  for (int row = 0; row < PW; row++) {
    u128 acc = 0;
    for (int i = 0; i < PW; i++) acc += (u128)PO_MDS[row][i] * s[i];
    r[row] = gl_reduce128(acc);
  }
  memcpy(s, r, sizeof(r));
}

// one full 30-round permutation, straightforward schedule (constant layer,
// S-box [lane 0 only in partial rounds], full MDS) — algebraically identical
// to the fast-partial decomposition (reference hash/poseidon.rs:791
// poseidon_naive, proven equal by its consistency test).
static void permute_one(u64* s) {
  for (int rnd = 0; rnd < N_ROUNDS; rnd++) {
    bool full = rnd < HALF_FULL || rnd >= HALF_FULL + N_PARTIAL;
    for (int i = 0; i < PW; i++) s[i] = gadd(s[i], PO_RC[i + PW * rnd]);
    if (full) {
      for (int i = 0; i < PW; i++) s[i] = sbox7(s[i]);
    } else {
      s[0] = sbox7(s[0]);
    }
    mds_full(s);
  }
}

void poseidon_permute(u64* states, i64 n) {
  for (i64 k = 0; k < n; k++) permute_one(states + k * PW);
}

// Overwrite-mode sponge (reference hash/hashing.rs:118): absorb `in_len`
// felts in rate-8 chunks, squeeze `out_len` (<= 8) felts. Batched over n
// independent inputs laid out [n, in_len].
void poseidon_hash_no_pad(const u64* inputs, i64 in_len, u64* out,
                          i64 out_len, i64 n) {
  for (i64 k = 0; k < n; k++) {
    u64 s[PW] = {0};
    const u64* in = inputs + k * in_len;
    for (i64 off = 0; off < in_len; off += 8) {
      i64 m = in_len - off < 8 ? in_len - off : 8;
      for (i64 i = 0; i < m; i++) s[i] = in[off + i];
      permute_one(s);
    }
    for (i64 i = 0; i < out_len; i++) out[k * out_len + i] = s[i];
  }
}

// ---------------------------------------------------------------------------
// PoseidonGate witness kernel (dual of gates/poseidon_gate.py run_once).
//
// Per row: inputs[12], swap in {0,1}  ->  out[122] in wire order:
//   4 deltas, 36 full_sbox_0 (rounds 1..3 x 12), 22 partial_sbox,
//   48 full_sbox_1 (rounds 0..3 x 12), 12 outputs.
// Uses the FAST partial-round decomposition — the gate's constraint system
// is written against these intermediate values, so the decomposition is
// consensus-critical (reference hash/poseidon_goldilocks.rs:27-219).
// ---------------------------------------------------------------------------

void poseidon_gate_witness(const u64* inputs_all, const u64* swaps, u64* out_all,
                           i64 n) {
  for (i64 k = 0; k < n; k++) {
    const u64* in = inputs_all + k * PW;
    u64 swap = swaps[k];
    u64* out = out_all + k * 122;
    i64 w = 0;

    for (int i = 0; i < 4; i++)
      out[w++] = gmul(swap, gsub(in[i + 4], in[i]));

    u64 s[PW];
    memcpy(s, in, sizeof(s));
    if (swap == 1) {
      for (int i = 0; i < 4; i++) {
        u64 t = s[i];
        s[i] = s[i + 4];
        s[i + 4] = t;
      }
    }

    int round_ctr = 0;
    for (int r = 0; r < HALF_FULL; r++) {
      for (int i = 0; i < PW; i++) s[i] = gadd(s[i], PO_RC[i + PW * round_ctr]);
      if (r != 0)
        for (int i = 0; i < PW; i++) out[w++] = s[i];
      for (int i = 0; i < PW; i++) s[i] = sbox7(s[i]);
      mds_full(s);
      round_ctr++;
    }

    // partial rounds, fast w-hat/v decomposition
    for (int i = 0; i < PW; i++) s[i] = gadd(s[i], PO_FAST_FIRST[i]);
    {
      // mds_partial_layer_init: res[c] = sum_{r>=1} init[r-1][c-1] * s[r]
      u64 res[PW];
      res[0] = s[0];
      for (int c = 1; c < PW; c++) {
        u64 acc = 0;
        for (int r = 1; r < PW; r++)
          acc = gadd(acc, gmul(PO_FAST_INIT[r - 1][c - 1], s[r]));
        res[c] = acc;
      }
      memcpy(s, res, sizeof(res));
    }
    for (int r = 0; r < N_PARTIAL; r++) {
      out[w++] = s[0];
      u64 s0 = sbox7(s[0]);
      if (r != N_PARTIAL - 1) s0 = gadd(s0, PO_FAST_RC[r]);
      // mds_partial_layer_fast
      const u64 mds0to0 = 17 + 8; // CIRC[0] + DIAG[0]
      u64 d = gmul(mds0to0, s0);
      for (int i = 1; i < PW; i++)
        d = gadd(d, gmul(PO_FAST_W_HATS[r][i - 1], s[i]));
      u64 res[PW];
      res[0] = d;
      for (int i = 1; i < PW; i++)
        res[i] = gadd(gmul(PO_FAST_VS[r][i - 1], s0), s[i]);
      memcpy(s, res, sizeof(res));
    }
    round_ctr += N_PARTIAL;

    for (int r = 0; r < HALF_FULL; r++) {
      for (int i = 0; i < PW; i++) s[i] = gadd(s[i], PO_RC[i + PW * round_ctr]);
      for (int i = 0; i < PW; i++) out[w++] = s[i];
      for (int i = 0; i < PW; i++) s[i] = sbox7(s[i]);
      mds_full(s);
      round_ctr++;
    }

    for (int i = 0; i < PW; i++) out[w++] = s[i];
  }
}

// ---------------------------------------------------------------------------
// keccak-f[1600] (dual of hash/keccak.py::keccak_f; lane A[x+5y])
// ---------------------------------------------------------------------------

static const u64 KC_RC[24] = {
    0x0000000000000001ull, 0x0000000000008082ull, 0x800000000000808Aull,
    0x8000000080008000ull, 0x000000000000808Bull, 0x0000000080000001ull,
    0x8000000080008081ull, 0x8000000000008009ull, 0x000000000000008Aull,
    0x0000000000000088ull, 0x0000000080008009ull, 0x000000008000000Aull,
    0x000000008000808Bull, 0x800000000000008Bull, 0x8000000000008089ull,
    0x8000000000008003ull, 0x8000000000008002ull, 0x8000000000000080ull,
    0x000000000000800Aull, 0x800000008000000Aull, 0x8000000080008081ull,
    0x8000000000008080ull, 0x0000000080000001ull, 0x8000000080008008ull};

static const int KC_ROT[5][5] = {{0, 36, 3, 41, 18},
                                 {1, 44, 10, 45, 2},
                                 {62, 6, 43, 15, 61},
                                 {28, 55, 25, 21, 56},
                                 {27, 20, 39, 8, 14}};

static inline u64 rotl(u64 v, int r) {
  return r == 0 ? v : (v << r) | (v >> (64 - r));
}

void keccak_f1600(u64* states, i64 n) {
  for (i64 k = 0; k < n; k++) {
    u64* A = states + k * 25;
    for (int rnd = 0; rnd < 24; rnd++) {
      u64 C[5], D[5];
      for (int x = 0; x < 5; x++)
        C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
      for (int x = 0; x < 5; x++)
        D[x] = C[(x + 4) % 5] ^ rotl(C[(x + 1) % 5], 1);
      for (int x = 0; x < 5; x++)
        for (int y = 0; y < 5; y++) A[x + 5 * y] ^= D[x];
      u64 B[25];
      for (int x = 0; x < 5; x++)
        for (int y = 0; y < 5; y++)
          B[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(A[x + 5 * y], KC_ROT[x][y]);
      for (int x = 0; x < 5; x++)
        for (int y = 0; y < 5; y++)
          A[x + 5 * y] = B[x + 5 * y] ^ (~B[(x + 1) % 5 + 5 * y] & B[(x + 2) % 5 + 5 * y]);
      A[0] ^= KC_RC[rnd];
    }
  }
}

} // extern "C"
