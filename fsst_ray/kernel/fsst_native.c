/* Fast bulk FSST encode/decode kernel.
 *
 * Same observable semantics as fsst_ray/kernel/fsst.py (the Python
 * oracle, itself golden-tested bit-identical to the reference
 * spiraldb/fsst crate). Only the greedy per-buffer parse lives here;
 * training, finalize and all table construction stay in Python.
 *
 * Compiled at first use by fsst_ray/kernel/native.py with the system C
 * compiler; loaded via ctypes. No external dependencies.
 *
 * Layout notes:
 *  - rows are passed as one concatenated byte buffer + int64 offsets
 *    (exactly an Arrow large_binary / list<int32> values-buffer view)
 *  - the output buffer must have capacity 2*input_len + 8 for compress
 *    (worst case all-escapes, +8 slack for the speculative escape-byte
 *    write) and decoded_len + 8 for decompress (8-byte symbol writes).
 */

#include <stdint.h>
#include <string.h>

#define CODE_UNUSED 0x11FF /* 511 + (1<<12) */
#define PHT_MASK 2047
#define ESCAPE 255

static inline uint64_t load_word(const uint8_t *p) {
    uint64_t w;
    memcpy(&w, p, 8);
    return w;
}

static inline uint64_t fsst_hash3(uint64_t word) {
    uint64_t v = word & 0xFFFFFF;
    return (v * 2971215073ULL) ^ (v >> 15);
}

/* One greedy step on `word`; writes at `op`, sets *adv_out to bytes
 * written (1 or 2), returns bytes consumed. Speculative raw-byte write
 * at op[1] mirrors the escape fast path. */
static inline int64_t compress_word(uint64_t word, const uint16_t *two_byte,
                                    const uint64_t *pht_symbol,
                                    const uint16_t *pht_code,
                                    const uint16_t *pht_ignored,
                                    uint8_t suffix_lim, uint8_t *op,
                                    int64_t *adv_out) {
    uint16_t ct = two_byte[(uint16_t)word];
    op[1] = (uint8_t)word; /* speculative escape byte */
    if ((uint8_t)ct < suffix_lim) {
        op[0] = (uint8_t)ct;
        *adv_out = 1;
        return 2;
    }
    uint32_t slot = (uint32_t)(fsst_hash3(word) & PHT_MASK);
    uint16_t pc = pht_code[slot];
    uint16_t ign = pht_ignored[slot];
    uint64_t mask = (ign >= 64) ? 0 : (~0ULL >> ign);
    if (pc != CODE_UNUSED && (word & mask) == pht_symbol[slot]) {
        op[0] = (uint8_t)pc;
        *adv_out = 1;
        return pc >> 12;
    }
    /* fallback: 1-byte code or escape */
    op[0] = (uint8_t)ct;
    *adv_out = 1 + ((ct & 0x1FF) >> 8);
    return ct >> 12;
}

int64_t fsst_compress_bulk(const uint8_t *data, const int64_t *offsets,
                           int64_t n_rows, const uint16_t *two_byte,
                           const uint64_t *pht_symbol,
                           const uint16_t *pht_code,
                           const uint16_t *pht_ignored, uint8_t suffix_lim,
                           uint8_t *out, int64_t *out_offsets) {
    uint8_t *op = out;
    out_offsets[0] = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        const uint8_t *in = data + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
        int64_t pos = 0;
        int64_t adv_out;
        while (pos + 8 <= len) {
            pos += compress_word(load_word(in + pos), two_byte, pht_symbol,
                                 pht_code, pht_ignored, suffix_lim, op,
                                 &adv_out);
            op += adv_out;
        }
        /* tail: zero-padded word, shifted as we consume */
        int64_t remaining = len - pos;
        uint64_t last_word = 0;
        memcpy(&last_word, in + pos, (size_t)remaining);
        while (remaining > 0) {
            int64_t adv =
                compress_word(last_word, two_byte, pht_symbol, pht_code,
                              pht_ignored, suffix_lim, op, &adv_out);
            op += adv_out;
            remaining -= adv;
            last_word = (adv >= 8) ? 0 : (last_word >> (8 * adv));
        }
        out_offsets[r + 1] = op - out;
    }
    return op - out;
}

/* ---- fixed-width bit packing (used by bitpack/FOR/RLE/dict codecs) ----
 * Little-endian bit order: value i occupies bits [i*width, (i+1)*width).
 * width must be <= 57 so the accumulator never overflows (carry < 8 bits).
 * Returns bytes written. */
int64_t bitpack(const int64_t *vals, int64_t n, int32_t width, uint8_t *out) {
    uint64_t acc = 0;
    int nbits = 0;
    int64_t opos = 0;
    for (int64_t i = 0; i < n; i++) {
        acc |= ((uint64_t)vals[i]) << nbits;
        nbits += width;
        while (nbits >= 8) {
            out[opos++] = (uint8_t)acc;
            acc >>= 8;
            nbits -= 8;
        }
    }
    if (nbits > 0)
        out[opos++] = (uint8_t)acc;
    return opos;
}

void bitunpack(const uint8_t *data, int64_t n, int32_t width, int64_t *out) {
    uint64_t acc = 0;
    int nbits = 0;
    int64_t ipos = 0;
    uint64_t mask = (width >= 64) ? ~0ULL : ((1ULL << width) - 1);
    for (int64_t i = 0; i < n; i++) {
        while (nbits < width) {
            acc |= ((uint64_t)data[ipos++]) << nbits;
            nbits += 8;
        }
        out[i] = (int64_t)(acc & mask);
        acc >>= width;
        nbits -= width;
    }
}

/* Order-sensitive per-row checksum of int32 token values:
 * sum over the row of (v + GOLDEN) * (local_pos + 1), wrapping u64.
 * Mirrors the numpy implementation in stages/decoder.py. */
void row_checksums(const int32_t *values, const int64_t *offsets,
                   int64_t n_rows, uint64_t *out) {
    const uint64_t golden = 0x9E3779B97F4A7C15ULL;
    for (int64_t r = 0; r < n_rows; r++) {
        uint64_t acc = 0;
        uint64_t pos = 1;
        for (int64_t i = offsets[r]; i < offsets[r + 1]; i++, pos++) {
            acc += ((uint64_t)(int64_t)values[i] + golden) * pos;
        }
        out[r] = acc;
    }
}

/* Returns total decoded bytes, or -1 if `out_cap` would be exceeded
 * (callers size out_cap as exact_decoded_size + 8 when known). */
int64_t fsst_decompress_bulk(const uint8_t *codes, const int64_t *offsets,
                             int64_t n_rows, const uint64_t *symbols,
                             const uint8_t *lengths, uint8_t *out,
                             int64_t out_cap, int64_t *out_offsets) {
    int64_t out_pos = 0;
    out_offsets[0] = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        const uint8_t *in = codes + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
        int64_t pos = 0;
        while (pos < len) {
            if (out_pos + 8 > out_cap)
                return -1;
            uint8_t code = in[pos];
            if (code == ESCAPE) {
                /* a valid stream never ends in a dangling escape */
                out[out_pos++] = (pos + 1 < len) ? in[pos + 1] : 0;
                pos += 2;
            } else {
                /* full-symbol write; overrun is masked by the next
                 * write or the +8 slack guaranteed by the cap check */
                memcpy(out + out_pos, &symbols[code], 8);
                out_pos += lengths[code];
                pos += 1;
            }
        }
        out_offsets[r + 1] = out_pos;
    }
    return out_pos;
}
