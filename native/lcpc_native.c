/* Native hot-path primitives for the lcpc_tpu host runtime.
 *
 * The transcript (merlin/STROBE-128 over Keccak-f[1600]) is sequential by
 * design and sits on the prove/verify critical path: a proof appends
 * O(n_per_row) field elements, each a meta-AD/meta-AD/AD triple.  The Python
 * implementation is the bit-exact reference twin; this C implementation is
 * the production path (see lcpc_tpu/fs/merlin.py for the byte-level spec and
 * lcpc-2d/src/lib.rs:1024-1068 for the protocol usage).
 *
 * Build: cc -O3 -shared -fPIC lcpc_native.c -o liblcpc_native.so
 * Little-endian hosts only (lane <-> byte transmutation).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define STROBE_R 166

#define FLAG_I 0x01
#define FLAG_A 0x02
#define FLAG_C 0x04
#define FLAG_M 0x10
#define FLAG_K 0x20

/* ---------------- Keccak-f[1600] ---------------- */

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static const int RHO[24] = {1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
                            27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44};
static const int PI[24] = {10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
                           15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1};

static inline uint64_t rotl64(uint64_t x, int n) {
    return (x << n) | (x >> (64 - n));
}

void lcpc_keccakf(uint64_t st[25]) {
    uint64_t bc[5], t;
    for (int round = 0; round < 24; round++) {
        /* theta */
        for (int i = 0; i < 5; i++)
            bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
        for (int i = 0; i < 5; i++) {
            t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
            for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
        }
        /* rho + pi */
        t = st[1];
        for (int i = 0; i < 24; i++) {
            int j = PI[i];
            bc[0] = st[j];
            st[j] = rotl64(t, RHO[i]);
            t = bc[0];
        }
        /* chi */
        for (int j = 0; j < 25; j += 5) {
            for (int i = 0; i < 5; i++) bc[i] = st[j + i];
            for (int i = 0; i < 5; i++)
                st[j + i] ^= (~bc[(i + 1) % 5]) & bc[(i + 2) % 5];
        }
        /* iota */
        st[0] ^= RC[round];
    }
}

/* ---------------- STROBE-128 (merlin subset) ---------------- */

typedef struct {
    uint8_t state[200];
    uint8_t pos;
    uint8_t pos_begin;
    uint8_t cur_flags;
    uint8_t _pad[5];
} strobe_t;

static void run_f(strobe_t *s) {
    s->state[s->pos] ^= s->pos_begin;
    s->state[s->pos + 1] ^= 0x04;
    s->state[STROBE_R + 1] ^= 0x80;
    lcpc_keccakf((uint64_t *)s->state);
    s->pos = 0;
    s->pos_begin = 0;
}

static void absorb(strobe_t *s, const uint8_t *data, size_t n) {
    for (size_t i = 0; i < n; i++) {
        s->state[s->pos++] ^= data[i];
        if (s->pos == STROBE_R) run_f(s);
    }
}

static void begin_op(strobe_t *s, uint8_t flags, int more) {
    if (more) return; /* caller guarantees flag continuity */
    uint8_t hdr[2];
    hdr[0] = s->pos_begin;
    hdr[1] = flags;
    s->pos_begin = s->pos + 1;
    s->cur_flags = flags;
    absorb(s, hdr, 2);
    if ((flags & (FLAG_C | FLAG_K)) && s->pos != 0) run_f(s);
}

void lcpc_strobe_init(strobe_t *s, const uint8_t *label, size_t llen) {
    memset(s, 0, sizeof(*s));
    s->state[0] = 1;
    s->state[1] = STROBE_R + 2;
    s->state[2] = 1;
    s->state[3] = 0;
    s->state[4] = 1;
    s->state[5] = 96;
    memcpy(s->state + 6, "STROBEv1.0.2", 12);
    lcpc_keccakf((uint64_t *)s->state);
    begin_op(s, FLAG_M | FLAG_A, 0);
    absorb(s, label, llen);
}

void lcpc_strobe_meta_ad(strobe_t *s, const uint8_t *d, size_t n, int more) {
    begin_op(s, FLAG_M | FLAG_A, more);
    absorb(s, d, n);
}

void lcpc_strobe_ad(strobe_t *s, const uint8_t *d, size_t n, int more) {
    begin_op(s, FLAG_A, more);
    absorb(s, d, n);
}

void lcpc_strobe_prf(strobe_t *s, uint8_t *out, size_t n) {
    begin_op(s, FLAG_I | FLAG_A | FLAG_C, 0);
    for (size_t i = 0; i < n; i++) {
        out[i] = s->state[s->pos];
        s->state[s->pos] = 0;
        s->pos++;
        if (s->pos == STROBE_R) run_f(s);
    }
}

/* merlin append_message: meta-AD(label); meta-AD(len_le32, more); AD(msg) */
void lcpc_transcript_append(strobe_t *s, const uint8_t *label, size_t llen,
                            const uint8_t *msg, size_t mlen) {
    uint8_t len4[4] = {(uint8_t)(mlen & 0xff), (uint8_t)((mlen >> 8) & 0xff),
                       (uint8_t)((mlen >> 16) & 0xff),
                       (uint8_t)((mlen >> 24) & 0xff)};
    lcpc_strobe_meta_ad(s, label, llen, 0);
    lcpc_strobe_meta_ad(s, len4, 4, 1);
    lcpc_strobe_ad(s, msg, mlen, 0);
}

/* batched append of `count` equal-size messages (field-element reprs) */
void lcpc_transcript_append_batch(strobe_t *s, const uint8_t *label,
                                  size_t llen, const uint8_t *data,
                                  size_t esize, size_t count) {
    for (size_t i = 0; i < count; i++)
        lcpc_transcript_append(s, label, llen, data + i * esize, esize);
}

void lcpc_transcript_challenge(strobe_t *s, const uint8_t *label, size_t llen,
                               uint8_t *out, size_t n) {
    uint8_t len4[4] = {(uint8_t)(n & 0xff), (uint8_t)((n >> 8) & 0xff),
                       (uint8_t)((n >> 16) & 0xff),
                       (uint8_t)((n >> 24) & 0xff)};
    lcpc_strobe_meta_ad(s, label, llen, 0);
    lcpc_strobe_meta_ad(s, len4, 4, 1);
    lcpc_strobe_prf(s, out, n);
}

/* ---------------- ChaCha20 RNG (rand_chacha 0.3 stream) ----------------
 *
 * Exact replica of rand_chacha::ChaCha20Rng's output stream as consumed by
 * the reference's expander-matrix generation (matgen.rs:43-44; Python twin
 * lcpc_tpu/fs/chacha.py): rand_core BlockRng with a 64-word (4-block)
 * buffer, 64-bit block counter in words 12-13, 64-bit stream in 14-15.
 * Matgen only ever draws via next_u64, so the word index stays pair-aligned
 * and next_u64 is always two consecutive buffer words.
 */

typedef struct {
    uint32_t key[8];
    uint32_t nonce[2];
    uint64_t counter; /* block counter of the NEXT refill */
    uint32_t buf[64];
    uint32_t idx; /* consumed words in buf */
    uint32_t _pad;
} lcpc_rng_t;

static inline uint32_t rotl32(uint32_t x, int n) {
    return (x << n) | (x >> (32 - n));
}

static void chacha_block(const lcpc_rng_t *r, uint64_t ctr, uint32_t out[16]) {
    uint32_t st[16];
    st[0] = 0x61707865u; st[1] = 0x3320646Eu;
    st[2] = 0x79622D32u; st[3] = 0x6B206574u;
    for (int i = 0; i < 8; i++) st[4 + i] = r->key[i];
    st[12] = (uint32_t)ctr;
    st[13] = (uint32_t)(ctr >> 32);
    st[14] = r->nonce[0];
    st[15] = r->nonce[1];
    uint32_t x[16];
    memcpy(x, st, sizeof(x));
#define QR(a, b, c, d)                                                      \
    x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 16);                           \
    x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 12);                           \
    x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 8);                            \
    x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 7);
    for (int i = 0; i < 10; i++) {
        QR(0, 4, 8, 12) QR(1, 5, 9, 13) QR(2, 6, 10, 14) QR(3, 7, 11, 15)
        QR(0, 5, 10, 15) QR(1, 6, 11, 12) QR(2, 7, 8, 13) QR(3, 4, 9, 14)
    }
#undef QR
    for (int i = 0; i < 16; i++) out[i] = x[i] + st[i];
}

static void rng_refill(lcpc_rng_t *r) {
    for (int b = 0; b < 4; b++)
        chacha_block(r, r->counter + (uint64_t)b, r->buf + 16 * b);
    r->counter += 4;
    r->idx = 0;
}

void lcpc_rng_init(lcpc_rng_t *r, const uint8_t key[32], uint64_t stream) {
    memcpy(r->key, key, 32);
    r->nonce[0] = (uint32_t)stream;
    r->nonce[1] = (uint32_t)(stream >> 32);
    r->counter = 0;
    r->idx = 64; /* empty: refill on first draw */
}

static inline uint64_t rng_next_u64(lcpc_rng_t *r) {
    if (r->idx >= 64) rng_refill(r);
    uint64_t lo = r->buf[r->idx];
    uint64_t hi = r->buf[r->idx + 1];
    r->idx += 2;
    return (hi << 32) | lo;
}

/* ---------------- expander matrix generation (matgen.rs:114-188) --------
 *
 * Per generated row: d DISTINCT uniform columns in [0, m) via rand 0.8's
 * Lemire widening-multiply (quadratic duplicate rejection), sorted; then,
 * in sorted order, one nonzero field element per column via ff 0.12
 * Field::random (masked limbs interpreted as Montgomery form, rejected
 * while >= p or zero).  vals_out receives the ACCEPTED MASKED DRAW — i.e.
 * the element's Montgomery representation, which is what the device wants;
 * the canonical value is draw * R^-1 mod p (computed host-side if needed).
 */

static inline int limbs_lt(const uint64_t *a, const uint64_t *b, int L) {
    for (int i = L - 1; i >= 0; i--) {
        if (a[i] < b[i]) return 1;
        if (a[i] > b[i]) return 0;
    }
    return 0;
}

void lcpc_gen_code(lcpc_rng_t *rng, uint64_t n, uint64_t m, uint64_t d,
                   const uint64_t *p_limbs, int nlimbs, uint64_t top_mask,
                   int64_t *cols_out, uint64_t *vals_out) {
    /* Lemire rejection zone for Uniform::new(0, m) over u64 */
    uint64_t ints_to_reject = (0xFFFFFFFFFFFFFFFFull - m + 1ull) % m;
    uint64_t zone = 0xFFFFFFFFFFFFFFFFull - ints_to_reject;
    uint64_t row_cols[64]; /* d <= 64 always (cn/dn are ~8-30) */
    uint64_t draw[8];

    for (uint64_t i = 0; i < n; i++) {
        uint64_t got = 0;
        while (got < d) {
            uint64_t x;
            for (;;) { /* Lemire sample */
                uint64_t v = rng_next_u64(rng);
                __uint128_t mm = (__uint128_t)v * (__uint128_t)m;
                if ((uint64_t)mm <= zone) { x = (uint64_t)(mm >> 64); break; }
            }
            int dup = 0;
            for (uint64_t k = 0; k < got; k++)
                if (row_cols[k] == x) { dup = 1; break; }
            if (!dup) row_cols[got++] = x;
        }
        /* insertion sort (d is tiny) */
        for (uint64_t a = 1; a < d; a++) {
            uint64_t v = row_cols[a];
            uint64_t b = a;
            while (b > 0 && row_cols[b - 1] > v) {
                row_cols[b] = row_cols[b - 1];
                b--;
            }
            row_cols[b] = v;
        }
        for (uint64_t k = 0; k < d; k++) {
            cols_out[i * d + k] = (int64_t)row_cols[k];
            for (;;) { /* Field::random, nonzero (matgen.rs:174-180) */
                int zero = 1;
                for (int l = 0; l < nlimbs; l++) draw[l] = rng_next_u64(rng);
                draw[nlimbs - 1] &= top_mask;
                for (int l = 0; l < nlimbs; l++)
                    if (draw[l]) { zero = 0; break; }
                if (!zero && limbs_lt(draw, p_limbs, nlimbs)) break;
            }
            for (int l = 0; l < nlimbs; l++)
                vals_out[(i * d + k) * nlimbs + l] = draw[l];
        }
    }
}
