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
