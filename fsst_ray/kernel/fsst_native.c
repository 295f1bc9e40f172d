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
 *  - the output buffer must have capacity 2*input_len + 8*n_rows + 8
 *    for compress (worst case all-escapes, +8 slack per row for the
 *    speculative escape-byte write in the lane-slotted layout) and
 *    decoded_len + 8 for decompress (8-byte symbol writes).
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

/* Branchless greedy step against the packed probe tables: identical
 * decisions to compress_word, expressed as selects so mixed-path data
 * does not stall on branch mispredicts. pht_sm packs [2*slot]=symbol,
 * [2*slot+1]=precomputed compare mask (one cache line per probe).
 * Returns (adv_in << 8) | adv_out packed, so callers keep lane state
 * in registers (no address-taken out-params). */
static inline int64_t step_word(uint64_t word, const uint16_t *two_byte,
                                const uint64_t *pht_sm,
                                const uint16_t *pht_code, uint8_t suffix_lim,
                                uint8_t *op) {
    uint16_t ct = two_byte[(uint16_t)word];
    op[1] = (uint8_t)word; /* speculative escape byte */
    if ((uint8_t)ct < suffix_lim) {
        /* two-byte fast path: short-circuits the PHT probe entirely
         * (the reference keeps this branch too, lib.rs:377) */
        op[0] = (uint8_t)ct;
        return (2 << 8) | 1;
    }
    uint32_t slot = (uint32_t)(fsst_hash3(word) & PHT_MASK);
    uint64_t sym = pht_sm[2 * slot];
    uint64_t msk = pht_sm[2 * slot + 1];
    uint16_t pc = pht_code[slot];
    /* hit-vs-escape select in pure mask arithmetic: gcc compiles the
     * ternary form to branches that mispredict on mixed data, stalling
     * every lane of the interleaved bulk loop */
    uint64_t hit_m = -(uint64_t)((pc != CODE_UNUSED) & ((word & msk) == sym));
    op[0] = (uint8_t)((hit_m & (uint8_t)pc) | (~hit_m & (uint8_t)ct));
    uint64_t adv_out = 1 + (~hit_m & ((ct >> 8) & 1));
    uint64_t adv_in =
        (hit_m & ((uint64_t)pc >> 12)) | (~hit_m & ((uint64_t)ct >> 12));
    return (int64_t)((adv_in << 8) | adv_out);
}

/* Branchy twin of step_word: identical decisions with real branches.
 * On highly-predictable data (uniform corpora: one symbol repeating, or
 * all escapes) the predictor makes branches free while the branchless
 * select pays its ALU+merge cost every step (measured: the reference's
 * branchy loop is ~2x ours on cf=1 and escape-only micro cases, while
 * ours is ~2x theirs on mixed realistic data). A cheap pre-scan picks
 * per call which loop body runs — same outputs either way. */
static inline int64_t step_word_br(uint64_t word, const uint16_t *two_byte,
                                   const uint64_t *pht_sm,
                                   const uint16_t *pht_code,
                                   uint8_t suffix_lim, uint8_t *op) {
    uint16_t ct = two_byte[(uint16_t)word];
    op[1] = (uint8_t)word; /* speculative escape byte */
    if ((uint8_t)ct < suffix_lim) {
        op[0] = (uint8_t)ct;
        return (2 << 8) | 1;
    }
    uint32_t slot = (uint32_t)(fsst_hash3(word) & PHT_MASK);
    uint64_t sym = pht_sm[2 * slot];
    uint64_t msk = pht_sm[2 * slot + 1];
    uint16_t pc = pht_code[slot];
    if (pc != CODE_UNUSED && (word & msk) == sym) {
        op[0] = (uint8_t)pc;
        return ((int64_t)(pc >> 12) << 8) | 1;
    }
    op[0] = (uint8_t)ct;
    return ((int64_t)(ct >> 12) << 8) | (1 + ((ct >> 8) & 1));
}

#ifndef N_LANES
#define N_LANES 4
#endif

typedef struct {
    const uint8_t *in; /* row start */
    int64_t len;
    int64_t pos;
    uint8_t *op;      /* current write cursor */
    uint8_t *op_base; /* row output start (worst-case slot) */
    int64_t row;      /* row index, -1 when idle (rows exhausted) */
} Lane;

/* worst-case output start of row r (relative offsets): 2 bytes per
 * input byte plus 8 slack per preceding row */
static inline int64_t wc_start(const int64_t *offsets, int64_t r) {
    return 2 * (offsets[r] - offsets[0]) + 8 * r;
}

/* finish the (< 8 byte) tail of a lane's current row with the shifted
 * zero-padded word loop, record its compressed size */
static void finish_tail(Lane *ln, const uint16_t *two_byte,
                        const uint64_t *pht_sm, const uint16_t *pht_code,
                        uint8_t suffix_lim, int64_t *out_offsets) {
    int64_t remaining = ln->len - ln->pos;
    uint64_t last_word = 0;
    memcpy(&last_word, ln->in + ln->pos, (size_t)remaining);
    while (remaining > 0) {
        int64_t s = step_word(last_word, two_byte, pht_sm, pht_code,
                              suffix_lim, ln->op);
        int64_t adv = s >> 8;
        ln->op += s & 0xFF;
        remaining -= adv;
        last_word = (adv >= 8) ? 0 : (last_word >> (8 * adv));
    }
    out_offsets[ln->row + 1] = ln->op - ln->op_base; /* size, for now */
}

static void refill(Lane *ln, const uint8_t *data, const int64_t *offsets,
                   int64_t n_rows, int64_t *next_row, uint8_t *out) {
    if (*next_row < n_rows) {
        int64_t r = (*next_row)++;
        ln->row = r;
        ln->in = data + offsets[r];
        ln->len = offsets[r + 1] - offsets[r];
        ln->op_base = ln->op = out + wc_start(offsets, r);
        ln->pos = 0;
    } else {
        ln->row = -1;
    }
}

/* Interleaved bulk compress: N_LANES rows advance in lockstep so their
 * independent load->lookup->advance dependency chains overlap in the
 * out-of-order window (the original FSST implementation's concurrent-
 * strings trick). Rows are written into per-row worst-case slots and
 * compacted in order afterwards; `out` must hold
 * 2*total + 8*n_rows + 8 bytes. Output is bit-identical to the
 * single-cursor loop: each row's greedy parse is independent of lane
 * scheduling. */
int64_t fsst_compress_bulk(const uint8_t *data, const int64_t *offsets,
                           int64_t n_rows, const uint16_t *two_byte,
                           const uint64_t *pht_symbol,
                           const uint16_t *pht_code,
                           const uint16_t *pht_ignored, uint8_t suffix_lim,
                           uint8_t *out, int64_t *out_offsets) {
    /* pack symbol+mask into adjacent u64 pairs: one probe = one line */
    uint64_t pht_sm[2 * (PHT_MASK + 1)];
    for (uint32_t s = 0; s <= PHT_MASK; s++) {
        uint16_t ign = pht_ignored[s];
        pht_sm[2 * s] = pht_symbol[s];
        pht_sm[2 * s + 1] = (ign >= 64) ? 0 : (~0ULL >> ign);
    }
    out_offsets[0] = 0;

    /* pre-scan ~512 words spread across the input: when the PHT-hit
     * branch outcome is near-constant (uniform corpora), the branchy
     * step is ~2x the branchless one (prediction makes the branch
     * free); on mixed data branchless wins by the same margin. The
     * sampled positions are not the greedy parse's positions — close
     * enough for a loop-body heuristic, and both bodies produce
     * identical output. */
    int branchy = 0;
    int64_t total = n_rows ? offsets[n_rows] - offsets[0] : 0;
    if (total >= (1 << 20)) {
        /* only large calls amortize the scan; production 32 KiB chunk
         * segments skip it and keep the branchless body. Branchy only
         * wins when the PHT branch mostly FALLS THROUGH (escape /
         * 1-byte-fallback corpora); hit-dominated data measured faster
         * branchless in the lane structure, so it stays there. */
        int64_t probes = 128, pht_miss = 0, reached = 0;
        for (int64_t k = 0; k < probes; k++) {
            int64_t i = (total - 8) * k / probes;
            uint64_t w = load_word(data + i);
            uint16_t ct = two_byte[(uint16_t)w];
            if ((uint8_t)ct < suffix_lim)
                continue;
            uint32_t slot = (uint32_t)(fsst_hash3(w) & PHT_MASK);
            reached++;
            if (!(pht_code[slot] != CODE_UNUSED &&
                  (w & pht_sm[2 * slot + 1]) == pht_sm[2 * slot]))
                pht_miss++;
        }
        branchy = reached >= 64 && pht_miss * 100 >= reached * 97;
    }

    Lane lanes[N_LANES];
    int64_t next_row = 0;
    for (int l = 0; l < N_LANES; l++)
        refill(&lanes[l], data, offsets, n_rows, &next_row, out);

    for (;;) {
        /* top up: finish tails / short rows until every lane is either
         * runnable (>= 8 readable bytes) or idle */
        for (int l = 0; l < N_LANES; l++) {
            while (lanes[l].row >= 0 && lanes[l].pos + 8 > lanes[l].len) {
                finish_tail(&lanes[l], two_byte, pht_sm, pht_code, suffix_lim,
                            out_offsets);
                refill(&lanes[l], data, offsets, n_rows, &next_row, out);
            }
        }
        int any_idle = 0;
        for (int l = 0; l < N_LANES; l++)
            any_idle |= (lanes[l].row < 0);
        if (any_idle)
            break; /* fewer than N_LANES rows remain: drain below */
        /* hoist lane state into locals: uint8_t* stores may alias the
         * Lane structs, so in-struct cursors would reload every step.
         * Fixed-size local arrays + full unroll keep these in registers. */
        const uint8_t *in_[N_LANES];
        int64_t pos_[N_LANES], end_[N_LANES];
        uint8_t *op_[N_LANES];
        for (int l = 0; l < N_LANES; l++) {
            in_[l] = lanes[l].in;
            pos_[l] = lanes[l].pos;
            end_[l] = lanes[l].len - 8;
            op_[l] = lanes[l].op;
        }
#define LOCKSTEP_LOOP(STEP)                                                   \
    {                                                                         \
        int run = 1;                                                          \
        do {                                                                  \
            _Pragma("GCC unroll 8") for (int l = 0; l < N_LANES; l++) {       \
                uint64_t w = load_word(in_[l] + pos_[l]);                     \
                int64_t s = STEP(w, two_byte, pht_sm, pht_code, suffix_lim,   \
                                 op_[l]);                                     \
                pos_[l] += s >> 8;                                            \
                op_[l] += s & 0xFF;                                           \
            }                                                                 \
            run = 1;                                                          \
            _Pragma("GCC unroll 8") for (int l = 0; l < N_LANES; l++)         \
                run &= (pos_[l] <= end_[l]);                                  \
        } while (run);                                                        \
    }
        if (branchy)
            LOCKSTEP_LOOP(step_word_br)
        else
            LOCKSTEP_LOOP(step_word)
#undef LOCKSTEP_LOOP
        for (int l = 0; l < N_LANES; l++) {
            lanes[l].pos = pos_[l];
            lanes[l].op = op_[l];
        }
    }

    /* drain the (<= N_LANES-1) still-active lanes one at a time; rows
     * are exhausted, so no refills happen. Single-row inputs spend
     * their whole life here, so the branchy/branchless choice applies
     * too (hoist cursors into locals like the lockstep loop). */
    for (int l = 0; l < N_LANES; l++) {
        Lane *ln = &lanes[l];
        if (ln->row < 0)
            continue;
        if (branchy) {
            const uint8_t *in = ln->in;
            int64_t pos = ln->pos, end = ln->len - 8;
            uint8_t *op = ln->op;
            while (pos <= end) {
                int64_t s = step_word_br(load_word(in + pos), two_byte,
                                         pht_sm, pht_code, suffix_lim, op);
                pos += s >> 8;
                op += s & 0xFF;
            }
            ln->pos = pos;
            ln->op = op;
        } else {
            while (ln->pos + 8 <= ln->len) {
                int64_t s = step_word(load_word(ln->in + ln->pos), two_byte,
                                      pht_sm, pht_code, suffix_lim, ln->op);
                ln->pos += s >> 8;
                ln->op += s & 0xFF;
            }
        }
        finish_tail(ln, two_byte, pht_sm, pht_code, suffix_lim, out_offsets);
    }

    /* compact rows (at worst-case starts, sizes in out_offsets[r+1])
     * into contiguous order; every final start <= its worst-case start,
     * so a forward memmove pass is safe */
    int64_t pos = 0;
    for (int64_t r = 0; r < n_rows; r++) {
        int64_t size = out_offsets[r + 1];
        int64_t src = wc_start(offsets, r);
        if (src != pos)
            memmove(out + pos, out + src, (size_t)size);
        pos += size;
        out_offsets[r + 1] = pos;
    }
    return pos;
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

/* ---- stream-vbyte (vbyte codec) ----
 * Layout per Lemire & Boytsov's published stream-vbyte: control bytes
 * first ((n+3)/4 bytes, 2-bit length codes, value i's code at bits
 * (i%4)*2 of ctrl[i/4]), then the little-endian low bytes of each
 * zigzagged uint32 value. Encode writes 4 data bytes per value and
 * advances by the true length, so `out` needs 3 bytes of slack past
 * the worst-case size (the Python wrapper allocates it). Returns total
 * bytes written (ctrl + data). */
int64_t vbyte_encode(const int32_t *vals, int64_t n, uint8_t *out) {
    int64_t n_ctrl = (n + 3) / 4;
    uint8_t *data = out + n_ctrl;
    int64_t dpos = 0;
    memset(out, 0, (size_t)n_ctrl);
    for (int64_t i = 0; i < n; i++) {
        int32_t v = vals[i];
        /* canonical 32-bit zigzag: unsigned left shift (UB-free), the
         * arithmetic right shift of the sign is implementation-defined
         * but universal on the targets we build for */
        uint32_t z = ((uint32_t)v << 1) ^ (uint32_t)(v >> 31);
        int len = 1 + (z >= (1u << 8)) + (z >= (1u << 16)) + (z >= (1u << 24));
        out[i >> 2] |= (uint8_t)((len - 1) << ((i & 3) * 2));
        memcpy(data + dpos, &z, 4); /* overshoot covered by slack */
        dpos += len;
    }
    return n_ctrl + dpos;
}

/* Decode n values from body (ctrl + data). Returns bytes consumed, or
 * -1 if the data region is shorter than the control bytes imply
 * (corrupt/truncated chunk). Reads at most 4 bytes per value via the
 * tail-guarded unaligned load, never past body_len. */
int64_t vbyte_decode(const uint8_t *body, int64_t body_len, int64_t n,
                     int32_t *out) {
    int64_t n_ctrl = (n + 3) / 4;
    if (body_len < n_ctrl)
        return -1; /* control region truncated: no byte of body is read */
    const uint8_t *data = body + n_ctrl;
    int64_t avail = body_len - n_ctrl;
    int64_t dpos = 0;
    int64_t i = 0;
    /* fast loop: full 4-byte loads while 4 bytes remain */
    for (; i < n && dpos + 4 <= avail; i++) {
        int len = ((body[i >> 2] >> ((i & 3) * 2)) & 3) + 1;
        uint32_t z;
        memcpy(&z, data + dpos, 4);
        z &= (len == 4) ? 0xFFFFFFFFu : ((1u << (len * 8)) - 1);
        dpos += len;
        out[i] = (int32_t)((z >> 1) ^ (0u - (z & 1)));
    }
    /* tail: byte loads with explicit bounds */
    for (; i < n; i++) {
        int len = ((body[i >> 2] >> ((i & 3) * 2)) & 3) + 1;
        if (dpos + len > avail)
            return -1;
        uint32_t z = data[dpos];
        if (len > 1) z |= (uint32_t)data[dpos + 1] << 8;
        if (len > 2) z |= (uint32_t)data[dpos + 2] << 16;
        if (len > 3) z |= (uint32_t)data[dpos + 3] << 24;
        dpos += len;
        out[i] = (int32_t)((z >> 1) ^ (0u - (z & 1)));
    }
    return n_ctrl + dpos;
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

/* ---- interleaved decompress into KNOWN output regions ----
 *
 * Here `out_offsets` is an INPUT: row r decodes into
 * out[out_offsets[r] .. out_offsets[r+1]). The encoder produces such
 * rows by compressing fixed-raw-size segments (fsst_codec.py
 * SEGMENT_BYTES), so decoded positions are known before decoding and
 * N_LANES rows advance in lockstep — the same concurrent-streams trick
 * as fsst_compress_bulk, which the reference's single-stream
 * decompressor (spiraldb/fsst src/lib.rs:255-303) cannot use. The
 * lockstep body is branchless (escape-vs-symbol via mask selects): the
 * escape branch is the classic decode mispredict, and one mispredict
 * would stall all four lanes.
 *
 * Stores within 8 bytes of a row's end switch to exact-length copies so
 * nothing crosses into a neighbouring row's region (another lane may
 * already have filled it); consequently this kernel NEVER writes
 * outside [out+out_offsets[0], out+out_offsets[n_rows]) — no slack
 * bytes needed. Returns total decoded bytes, or -1 if any row fails to
 * decode to exactly its declared size (corrupt stream). */

typedef struct {
    const uint8_t *in;
    int64_t len;
    int64_t pos;
    uint8_t *op;
    uint8_t *lim;
    int64_t row; /* -1 when idle (rows exhausted) */
} DLane;

static inline int dstep_careful(DLane *ln, const uint64_t *symbols,
                                const uint8_t *lengths) {
    uint8_t code = ln->in[ln->pos];
    if (code == ESCAPE) {
        if (ln->op >= ln->lim)
            return -1;
        /* a valid stream never ends in a dangling escape */
        *ln->op++ = (ln->pos + 1 < ln->len) ? ln->in[ln->pos + 1] : 0;
        ln->pos += 2;
    } else {
        uint8_t L = lengths[code];
        if (ln->op + L > ln->lim)
            return -1;
        uint64_t sym = symbols[code];
        if (ln->op + 8 <= ln->lim)
            memcpy(ln->op, &sym, 8);
        else
            memcpy(ln->op, &sym, (size_t)L); /* exact tail write */
        ln->op += L;
        ln->pos += 1;
    }
    return 0;
}

static void drefill(DLane *ln, const uint8_t *codes, const int64_t *offsets,
                    const int64_t *out_offsets, int64_t n_rows,
                    int64_t *next_row, uint8_t *out) {
    if (*next_row < n_rows) {
        int64_t r = (*next_row)++;
        ln->row = r;
        ln->in = codes + offsets[r];
        ln->len = offsets[r + 1] - offsets[r];
        ln->pos = 0;
        ln->op = out + out_offsets[r];
        ln->lim = out + out_offsets[r + 1];
    } else {
        ln->row = -1;
    }
}

int64_t fsst_decompress_bulk_at(const uint8_t *codes, const int64_t *offsets,
                                int64_t n_rows, const uint64_t *symbols,
                                const uint8_t *lengths, uint8_t *out,
                                const int64_t *out_offsets) {
    if (n_rows <= 0)
        return 0;
    /* pre-scan: the sampled escape rate picks the lockstep body.
     * Near-constant branch outcomes (rate ~0 or ~1) run faster branchy
     * — prediction makes the branch free while mask selects pay ALU
     * cost every step; mixed rates stall the predictor and run
     * branchless. (A sampled byte can be an escaped literal rather
     * than a code — close enough for a loop-body heuristic; both
     * bodies produce identical output.) */
    int branchy = 1;
    int64_t total = offsets[n_rows] - offsets[0];
    if (total >= 4096) {
        int64_t esc = 0, probes = 256;
        for (int64_t k = 0; k < probes; k++)
            esc += (codes[offsets[0] + (total - 1) * k / probes] == ESCAPE);
        branchy = (esc * 100 <= probes * 15) || (esc * 100 >= probes * 90);
    }
    DLane lanes[N_LANES];
    int64_t next_row = 0;
    for (int l = 0; l < N_LANES; l++)
        drefill(&lanes[l], codes, offsets, out_offsets, n_rows, &next_row,
                out);

    for (;;) {
        /* top up: careful-step each lane to a runnable state (>= 2
         * readable input bytes, >= 8 writable output bytes), verifying
         * and refilling rows that end */
        for (int l = 0; l < N_LANES; l++) {
            DLane *ln = &lanes[l];
            while (ln->row >= 0 &&
                   (ln->pos + 2 > ln->len || ln->op + 8 > ln->lim)) {
                if (ln->pos >= ln->len) {
                    if (ln->op != ln->lim)
                        return -1; /* row decoded to the wrong size */
                    drefill(ln, codes, offsets, out_offsets, n_rows,
                            &next_row, out);
                } else if (dstep_careful(ln, symbols, lengths)) {
                    return -1;
                }
            }
        }
        int any_idle = 0;
        for (int l = 0; l < N_LANES; l++)
            any_idle |= (lanes[l].row < 0);
        if (any_idle)
            break; /* fewer than N_LANES rows remain: drain below */

        const uint8_t *in_[N_LANES];
        int64_t pos_[N_LANES], end_[N_LANES];
        uint8_t *op_[N_LANES], *lim_[N_LANES];
        for (int l = 0; l < N_LANES; l++) {
            in_[l] = lanes[l].in;
            pos_[l] = lanes[l].pos;
            end_[l] = lanes[l].len - 2;
            op_[l] = lanes[l].op;
            lim_[l] = lanes[l].lim - 8;
        }
        /* do-while is safe: the FIRST round is guarded by the top-up
         * loop above, every later round by the run recomputation */
        int run = 1;
#define DLOCKSTEP(BODY)                                                       \
    do {                                                                      \
        _Pragma("GCC unroll 8") for (int l = 0; l < N_LANES; l++) { BODY }    \
        run = 1;                                                              \
        _Pragma("GCC unroll 8") for (int l = 0; l < N_LANES; l++)             \
            run &= (pos_[l] <= end_[l]) & (op_[l] <= lim_[l]);                \
    } while (run)
        if (branchy) {
            /* predictable escape branch (rate near 0 or 1): branches
             * are free while the mask selects pay ALU cost every step */
            DLOCKSTEP({
                uint8_t code = in_[l][pos_[l]];
                if (code == ESCAPE) {
                    op_[l][0] = in_[l][pos_[l] + 1];
                    op_[l] += 1;
                    pos_[l] += 2;
                } else {
                    uint64_t sym = symbols[code];
                    memcpy(op_[l], &sym, 8);
                    op_[l] += lengths[code];
                    pos_[l] += 1;
                }
            });
        } else {
            /* mixed data: one mispredict would stall all four lanes,
             * so select escape-vs-symbol with mask arithmetic */
            DLOCKSTEP({
                uint8_t code = in_[l][pos_[l]];
                uint64_t esc_m = -(uint64_t)(code == ESCAPE);
                uint64_t w = (esc_m & in_[l][pos_[l] + 1]) |
                             (~esc_m & symbols[code]);
                memcpy(op_[l], &w, 8);
                op_[l] += (esc_m & 1) | (~esc_m & lengths[code]);
                pos_[l] += 1 + (int64_t)(esc_m & 1);
            });
        }
#undef DLOCKSTEP
        for (int l = 0; l < N_LANES; l++) {
            lanes[l].pos = pos_[l];
            lanes[l].op = op_[l];
        }
    }

    /* drain the (<= N_LANES-1) still-active lanes one at a time */
    for (int l = 0; l < N_LANES; l++) {
        DLane *ln = &lanes[l];
        if (ln->row < 0)
            continue;
        for (;;) {
            const uint8_t *in = ln->in;
            int64_t pos = ln->pos, end = ln->len - 2;
            uint8_t *op = ln->op, *lim = ln->lim - 8;
            while (pos <= end && op <= lim) {
                uint8_t code = in[pos];
                uint64_t esc_m = -(uint64_t)(code == ESCAPE);
                uint64_t w = (esc_m & in[pos + 1]) | (~esc_m & symbols[code]);
                memcpy(op, &w, 8);
                op += (esc_m & 1) | (~esc_m & lengths[code]);
                pos += 1 + (int64_t)(esc_m & 1);
            }
            ln->pos = pos;
            ln->op = op;
            if (ln->pos >= ln->len)
                break;
            if (dstep_careful(ln, symbols, lengths))
                return -1;
        }
        if (ln->op != ln->lim)
            return -1;
    }
    return out_offsets[n_rows] - out_offsets[0];
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
