// H.264 host-side serial layer: CAVLC slice entropy decode + in-loop
// deblocking filter.
//
// Role split (SURVEY.md §7): the irreducibly serial bitstream walk
// (entropy decode, neighbor-context tracking, MV prediction) runs here
// on the host and emits flat per-MB tensors; the data-parallel pixel
// work (dequant/IDCT, qpel motion compensation, intra batches) runs on
// device from those tensors. Behavioral reference (not a translation):
// /root/reference/libavcodec/h264_cavlc.c, h264_mvpred.h,
// h264_loopfilter.c, h264data.c. Spec: ISO/IEC 14496-10 §7.3.5, §8.4.1,
// §8.7, §9.2.
//
// Build: compiled into _bitstream.so together with bitstream.cpp (see
// native/build.py).

#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#include "h264_tables.h"

// ---------------------------------------------------------------------------
// Bit reader over RBSP (emulation prevention already removed)
// ---------------------------------------------------------------------------

namespace {

struct HBits {
    const uint8_t* data;
    int nbits;     // total payload bits (up to and including rbsp stop bit)
    int pos;       // current bit position
    int last_bit;  // position of the rbsp_stop_one_bit (last set bit)
    int error;
};

inline int hb_read1(HBits* b) {
    if (b->pos >= b->nbits) { b->error = 1; return 0; }
    int v = (b->data[b->pos >> 3] >> (7 - (b->pos & 7))) & 1;
    b->pos++;
    return v;
}

inline uint32_t hb_read(HBits* b, int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | (uint32_t)hb_read1(b);
    return v;
}

inline uint32_t hb_ue(HBits* b) {
    int zeros = 0;
    while (!hb_read1(b)) {
        if (++zeros > 31 || b->error) { b->error = 1; return 0; }
    }
    return ((1u << zeros) - 1) + (zeros ? hb_read(b, zeros) : 0);
}

inline int32_t hb_se(HBits* b) {
    uint32_t k = hb_ue(b);
    return (k & 1) ? (int32_t)((k + 1) >> 1) : -(int32_t)(k >> 1);
}

// te(v) with range [0, max]
inline int hb_te(HBits* b, int maxv) {
    if (maxv == 0) return 0;
    if (maxv == 1) return !hb_read1(b);
    return (int)hb_ue(b);
}

// more_rbsp_data(): true while bits remain before the rbsp stop bit
inline int hb_more(const HBits* b) {
    return !b->error && b->pos < b->last_bit;
}

int find_last_set_bit(const uint8_t* data, int nbytes) {
    for (int i = nbytes - 1; i >= 0; i--) {
        if (data[i]) {
            int byte = data[i];
            for (int k = 0; k < 8; k++)
                if (byte & (1 << k)) return i * 8 + (7 - k);
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// CAVLC residual (§9.2) — mirrors codecs/h264/cavlc.py semantics
// ---------------------------------------------------------------------------

inline int token_table(int nc) {
    if (nc < 2) return 0;
    if (nc < 4) return 1;
    if (nc < 8) return 2;
    return 3;
}

// match (total,t1) against a [ntotals*4] len/bits table, MSB-first
int read_token(HBits* b, const uint8_t* len_tab, const uint8_t* bits_tab,
               int ntotals, int* total, int* t1) {
    uint32_t code = 0;
    for (int ln = 1; ln <= 16; ln++) {
        code = (code << 1) | (uint32_t)hb_read1(b);
        if (b->error) return -1;
        for (int t = 0; t < ntotals; t++)
            for (int o = 0; o < 4; o++)
                if (len_tab[t * 4 + o] == ln && bits_tab[t * 4 + o] == code) {
                    *total = t; *t1 = o; return 0;
                }
    }
    return -1;
}

int read_vlc_row(HBits* b, const uint8_t* len_row, const uint8_t* bits_row,
                 int n) {
    uint32_t code = 0;
    for (int ln = 1; ln <= 15; ln++) {
        code = (code << 1) | (uint32_t)hb_read1(b);
        if (b->error) return -1;
        for (int v = 0; v < n; v++)
            if (len_row[v] == ln && bits_row[v] == code) return v;
    }
    return -1;
}

// Decode one residual block into out[maxc] (zigzag order). nc = -1 means
// the chroma-DC table. Returns total_coeff, or -1 on error.
int residual_block(HBits* b, int16_t* out, int maxc, int nc) {
    memset(out, 0, sizeof(int16_t) * maxc);
    int total = 0, t1 = 0;
    if (nc >= 0) {
        int tab = token_table(nc);
        if (tab == 3) {
            int v = (int)hb_read(b, 6);
            if (v == 3) return 0;
            total = (v >> 2) + 1;
            t1 = v & 3;
        } else {
            if (read_token(b, COEFF_TOKEN_LEN[tab], COEFF_TOKEN_BITS[tab],
                           17, &total, &t1) < 0) return -1;
        }
    } else {
        if (read_token(b, CHROMA_DC_COEFF_TOKEN_LEN,
                       CHROMA_DC_COEFF_TOKEN_BITS, 5, &total, &t1) < 0)
            return -1;
    }
    if (total == 0) return 0;
    if (total > maxc) return -1;

    int32_t levels[16];
    for (int k = 0; k < t1; k++)
        levels[k] = hb_read1(b) ? -1 : 1;
    int suffix_len = (total > 10 && t1 < 3) ? 1 : 0;
    int first = 1;
    for (int k = t1; k < total; k++) {
        int prefix = 0;
        while (!hb_read1(b)) {
            if (++prefix > 32 || b->error) return -1;
        }
        int code;
        if (suffix_len == 0) {
            if (prefix < 14) code = prefix;
            else if (prefix == 14) code = 14 + (int)hb_read(b, 4);
            else code = 30 + (int)hb_read(b, 12);
        } else {
            if (prefix < 15)
                code = (prefix << suffix_len) | (int)hb_read(b, suffix_len);
            else
                code = (15 << suffix_len) + (int)hb_read(b, 12);
        }
        if (first && t1 < 3) code += 2;
        first = 0;
        int32_t level = (code % 2 == 0) ? ((code + 2) >> 1)
                                        : -((code + 1) >> 1);
        levels[k] = level;
        if (suffix_len == 0) suffix_len = 1;
        int32_t al = level < 0 ? -level : level;
        if (al > (3 << (suffix_len - 1)) && suffix_len < 6) suffix_len++;
    }
    int tz = 0;
    if (total < maxc) {
        if (nc >= 0)
            tz = read_vlc_row(b, TOTAL_ZEROS_LEN[total - 1],
                              TOTAL_ZEROS_BITS[total - 1], 16);
        else
            tz = read_vlc_row(b, CHROMA_DC_TOTAL_ZEROS_LEN[total - 1],
                              CHROMA_DC_TOTAL_ZEROS_BITS[total - 1], 4);
        if (tz < 0) return -1;
    }
    int runs[16];
    int zeros_left = tz;
    for (int k = 0; k < total - 1; k++) {
        if (zeros_left <= 0) { runs[k] = 0; continue; }
        int tabrow = (zeros_left < 7 ? zeros_left : 7) - 1;
        int run = read_vlc_row(b, RUN_LEN[tabrow], RUN_BITS[tabrow], 16);
        if (run < 0) return -1;
        runs[k] = run;
        zeros_left -= run;
    }
    runs[total - 1] = zeros_left;
    int pos = total + tz - 1;
    if (pos >= maxc) return -1;
    for (int k = 0; k < total; k++) {
        if (pos < 0) return -1;
        out[pos] = (int16_t)levels[k];
        if (k < total - 1) pos -= runs[k] + 1;
    }
    return total;
}

// ---------------------------------------------------------------------------
// Slice decode context
// ---------------------------------------------------------------------------

// mb_kind codes (shared with the Python recon layer)
enum { K_PSKIP = 0, K_INTER = 1, K_I4X4 = 2, K_I16 = 3, K_IPCM = 4,
       K_I8X8 = 5, K_UNDECODED = -1 };

// mb_info bit 14: the MB uses the 8x8 transform (inter or I_8x8); its
// luma residual rows hold 8x8-zigzag levels (rows 1+4g..4+4g = the 64
// levels of 8x8 group g)
#define INFO_T8 (1 << 14)

// 8x8 zigzag scan idx -> raster (§8.5.6; cf. mathtables.c
// ff_zigzag_direct) -- used to dezigzag 8x8 residual rows at recon
static const uint8_t ZZ8[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// normAdjust8x8 position-class pattern + factors (§8.5.9; cf.
// h264data.c ff_h264_dequant8_coeff_init*): class of raster position
// (r, c) = D8CLS[4 * (r & 3) + (c & 3)]
static const uint8_t D8CLS[16] = {0,3,4,3, 3,1,5,1, 4,5,2,5, 3,1,5,1};
static const uint8_t D8INIT[6][6] = {
    {20, 18, 32, 19, 25, 24}, {22, 19, 35, 21, 28, 26},
    {26, 23, 42, 24, 33, 31}, {28, 25, 45, 26, 35, 33},
    {32, 28, 51, 30, 40, 38}, {36, 32, 58, 34, 46, 43}};

// block index -> (row4, col4) within MB, §6.4.3 4x4 scan order
static const int BLK4[16][2] = {
    {0,0},{0,1},{1,0},{1,1},{0,2},{0,3},{1,2},{1,3},
    {2,0},{2,1},{3,0},{3,1},{2,2},{2,3},{3,2},{3,3}};

// CBP me(v) mapping (Table 9-4; ISO spec data, cf. h264data.c:42-55)
static const uint8_t GOLOMB_TO_INTRA4X4_CBP[48] = {
    47, 31, 15, 0,  23, 27, 29, 30, 7,  11, 13, 14, 39, 43, 45, 46,
    16, 3,  5,  10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1,  2,  4,
    8,  17, 18, 20, 24, 6,  9,  22, 25, 32, 33, 34, 36, 40, 38, 41};
static const uint8_t GOLOMB_TO_INTER_CBP[48] = {
    0,  16, 1,  2,  4,  8,  32, 3,  5,  10, 12, 15, 47, 7,  11, 13,
    14, 6,  9,  31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41};

struct SliceCtx {
    int mb_w, mb_h;
    int w4, h4;       // luma 4x4 grid dims
    int wc, hc;       // chroma 4x4 grid dims
    // nC total_coeff contexts (-1 = unavailable)
    int8_t* tcY;
    int8_t* tcU;
    int8_t* tcV;
    // motion grids (per luma 4x4); list 1 used by B slices
    int16_t* mvg;     // [h4*w4*2]
    int8_t* refg;     // [h4*w4]: -2 undecoded, -1 intra/unused, >=0 ref
    int16_t* mvg1;
    int8_t* refg1;
    // intra 4x4 mode grid: -2 undecoded, -1 available-non-I4x4, >=0 mode
    int8_t* i4g;
    uint8_t* decoded; // per-MB decoded flag (this slice)
};

inline int tc_nc(const int8_t* grid, int w, int by, int bx) {
    int na = bx > 0 ? grid[by * w + bx - 1] : -1;
    int nb = by > 0 ? grid[(by - 1) * w + bx] : -1;
    if (na >= 0 && nb >= 0) return (na + nb + 1) >> 1;
    if (na >= 0) return na;
    if (nb >= 0) return nb;
    return 0;
}

// --- motion vector prediction (§8.4.1.3) --------------------------------

// fetch neighbor (x4,y4) on the 4x4 grid: returns 1 if the block is
// available (decoded in this slice); fills mv/ref (intra -> ref=-1,mv=0)
inline int fetch_n(const SliceCtx* c, int x4, int y4,
                   int* refn, int* mvx, int* mvy) {
    *refn = -1; *mvx = 0; *mvy = 0;
    if (x4 < 0 || y4 < 0 || x4 >= c->w4 || y4 >= c->h4) return 0;
    int8_t r = c->refg[y4 * c->w4 + x4];
    if (r == -2) return 0;   // not decoded (other slice / future MB)
    if (r >= 0) {
        *refn = r;
        *mvx = c->mvg[(y4 * c->w4 + x4) * 2];
        *mvy = c->mvg[(y4 * c->w4 + x4) * 2 + 1];
    }
    return 1;                // available (intra contributes ref=-1, mv=0)
}

inline int median3(int a, int b, int cc) {
    int mx = a > b ? a : b; if (cc > mx) mx = cc;
    int mn = a < b ? a : b; if (cc < mn) mn = cc;
    return a + b + cc - mx - mn;
}

// Predict mv for a partition at (x4,y4) size (w4p,h4p) with ref `ref`.
// part_kind: 0 normal median; 1 = 16x8 top; 2 = 16x8 bottom;
//            3 = 8x16 left; 4 = 8x16 right.
void mv_pred(const SliceCtx* c, int x4, int y4, int w4p, int h4p,
             int ref, int part_kind, int* px, int* py) {
    int refA, mvxA, mvyA, refB, mvxB, mvyB, refC, mvxC, mvyC;
    int availA = fetch_n(c, x4 - 1, y4, &refA, &mvxA, &mvyA);
    int availB = fetch_n(c, x4, y4 - 1, &refB, &mvxB, &mvyB);
    int availC = fetch_n(c, x4 + w4p, y4 - 1, &refC, &mvxC, &mvyC);
    if (!availC)  // substitute D (top-left)
        availC = fetch_n(c, x4 - 1, y4 - 1, &refC, &mvxC, &mvyC);

    // directional shortcuts for 16x8 / 8x16 partitions (§8.4.1.3.1)
    if (part_kind == 1 && availB && refB == ref) { *px = mvxB; *py = mvyB; return; }
    if (part_kind == 2 && availA && refA == ref) { *px = mvxA; *py = mvyA; return; }
    if (part_kind == 3 && availA && refA == ref) { *px = mvxA; *py = mvyA; return; }
    if (part_kind == 4 && availC && refC == ref) { *px = mvxC; *py = mvyC; return; }

    // when B and C are both unavailable, use A (if available)
    if (!availB && !availC && availA) { *px = mvxA; *py = mvyA; return; }

    int eqA = availA && refA == ref;
    int eqB = availB && refB == ref;
    int eqC = availC && refC == ref;
    if (eqA && !eqB && !eqC) { *px = mvxA; *py = mvyA; return; }
    if (!eqA && eqB && !eqC) { *px = mvxB; *py = mvyB; return; }
    if (!eqA && !eqB && eqC) { *px = mvxC; *py = mvyC; return; }
    *px = median3(mvxA, mvxB, mvxC);
    *py = median3(mvyA, mvyB, mvyC);
}

void fill_part(SliceCtx* c, int x4, int y4, int w4p, int h4p,
               int ref, int mvx, int mvy) {
    for (int y = y4; y < y4 + h4p; y++)
        for (int x = x4; x < x4 + w4p; x++) {
            c->refg[y * c->w4 + x] = (int8_t)ref;
            c->mvg[(y * c->w4 + x) * 2] = (int16_t)mvx;
            c->mvg[(y * c->w4 + x) * 2 + 1] = (int16_t)mvy;
        }
}

}  // namespace

// ---------------------------------------------------------------------------
// Public entry: decode one CAVLC slice (I or P) to per-MB tensors
// ---------------------------------------------------------------------------
//
// Coefficient layout per MB: 27 blocks x 16 int16, ZIGZAG order:
//   blk 0      luma DC (Intra_16x16 only)
//   blk 1..16  luma 4x4 in raster (by*4+bx) order; AC-only blocks keep [0]=0
//   blk 17,18  chroma DC (u, v; 4 coeffs used)
//   blk 19..22 chroma u AC raster; 23..26 chroma v AC raster
//
// Outputs (caller-allocated, nMB-major):
//   mb_kind  [nMB]        K_* codes; K_UNDECODED for MBs outside the slice
//   mb_info  [nMB]        imode16 | chroma_mode<<4 | cbp<<8
//   i4modes  [nMB*16]     Intra_4x4 modes, raster order within MB
//   mv_out   [nMB*16*2]   per-4x4 mv (qpel), raster within MB
//   ref_out  [nMB*4]      per-8x8 ref idx (-1 for intra)
//   qp_out   [nMB]        luma QP after mb_qp_delta accumulation
//   coeffs   [nMB*27*16]
//   ncoef    [nMB*27]     total_coeff per block (deblock bS input)
//   end_state[2]          { end_bit_pos, mbs_decoded }
//
// Returns 0 on success; negative error codes otherwise.
extern "C" int h264_decode_slice_cavlc(
    const uint8_t* rbsp, int nbytes, int start_bit,
    int mb_w, int mb_h, int first_mb,
    int slice_type,          // 0 = P, 1 = B, 2 = I
    int slice_qp, int num_ref_idx_l0,
    int32_t* mb_kind, int32_t* mb_info, int8_t* i4modes,
    int16_t* mv_out, int8_t* ref_out, int32_t* qp_out,
    int16_t* coeffs, int16_t* ncoef, int32_t* end_state,
    int num_ref_idx_l1, int16_t* mv1_out, int8_t* ref1_out,
    int transform_8x8_mode)
{
    const int nMB = mb_w * mb_h;
    const int is_b = slice_type == 1;
    const int is_p = slice_type == 0 || is_b;   // inter slice kinds
    if (first_mb < 0 || first_mb >= nMB) return -1;

    HBits b;
    b.data = rbsp; b.nbits = nbytes * 8; b.pos = start_bit; b.error = 0;
    b.last_bit = find_last_set_bit(rbsp, nbytes);

    SliceCtx c;
    c.mb_w = mb_w; c.mb_h = mb_h;
    c.w4 = mb_w * 4; c.h4 = mb_h * 4;
    c.wc = mb_w * 2; c.hc = mb_h * 2;
    c.tcY = (int8_t*)malloc((size_t)c.w4 * c.h4);
    c.tcU = (int8_t*)malloc((size_t)c.wc * c.hc);
    c.tcV = (int8_t*)malloc((size_t)c.wc * c.hc);
    c.mvg = (int16_t*)calloc((size_t)c.w4 * c.h4 * 2, sizeof(int16_t));
    c.refg = (int8_t*)malloc((size_t)c.w4 * c.h4);
    c.i4g = (int8_t*)malloc((size_t)c.w4 * c.h4);
    c.decoded = (uint8_t*)calloc((size_t)nMB, 1);
    c.mvg1 = (int16_t*)calloc((size_t)c.w4 * c.h4 * 2, sizeof(int16_t));
    c.refg1 = (int8_t*)malloc((size_t)c.w4 * c.h4);
    memset(c.tcY, -1, (size_t)c.w4 * c.h4);
    memset(c.tcU, -1, (size_t)c.wc * c.hc);
    memset(c.tcV, -1, (size_t)c.wc * c.hc);
    memset(c.refg, -2, (size_t)c.w4 * c.h4);
    memset(c.refg1, -2, (size_t)c.w4 * c.h4);
    memset(c.i4g, -2, (size_t)c.w4 * c.h4);

    int qp = slice_qp;
    int mb = first_mb;
    int err = 0;

    #define FAIL(code) do { err = (code); goto done; } while (0)

    while (mb < nMB) {
        int skip_run = 0;
        if (is_b) {
            if (!hb_more(&b)) break;
            skip_run = (int)hb_ue(&b);
            if (b.error) FAIL(-2);
            if (skip_run) FAIL(-8);    // B_Skip (direct) unsupported
        } else if (is_p) {
            if (!hb_more(&b)) break;
            skip_run = (int)hb_ue(&b);
            if (b.error) FAIL(-2);
            for (int s = 0; s < skip_run && mb < nMB; s++, mb++) {
                int my = mb / mb_w, mx = mb % mb_w;
                // P_SKIP mv derivation (§8.4.1.1): mvp unless the
                // left/top MB condition forces zero
                int refA, mvxA, mvyA, refB, mvxB, mvyB;
                int availA = fetch_n(&c, mx * 4 - 1, my * 4,
                                     &refA, &mvxA, &mvyA);
                int availB = fetch_n(&c, mx * 4, my * 4 - 1,
                                     &refB, &mvxB, &mvyB);
                int mvx = 0, mvy = 0;
                if (availA && availB &&
                    !(refA == 0 && mvxA == 0 && mvyA == 0) &&
                    !(refB == 0 && mvxB == 0 && mvyB == 0))
                    mv_pred(&c, mx * 4, my * 4, 4, 4, 0, 0, &mvx, &mvy);
                fill_part(&c, mx * 4, my * 4, 4, 4, 0, mvx, mvy);
                mb_kind[mb] = K_PSKIP;
                mb_info[mb] = 0;
                qp_out[mb] = qp;
                ref_out[mb * 4 + 0] = ref_out[mb * 4 + 1] = 0;
                ref_out[mb * 4 + 2] = ref_out[mb * 4 + 3] = 0;
                for (int i = 0; i < 16; i++) {
                    mv_out[(mb * 16 + i) * 2] = (int16_t)mvx;
                    mv_out[(mb * 16 + i) * 2 + 1] = (int16_t)mvy;
                }
                // contexts: all total_coeff zero, available
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++) {
                        c.tcY[(my * 4 + y) * c.w4 + mx * 4 + x] = 0;
                        c.i4g[(my * 4 + y) * c.w4 + mx * 4 + x] = -1;
                    }
                for (int y = 0; y < 2; y++)
                    for (int x = 0; x < 2; x++) {
                        c.tcU[(my * 2 + y) * c.wc + mx * 2 + x] = 0;
                        c.tcV[(my * 2 + y) * c.wc + mx * 2 + x] = 0;
                    }
                c.decoded[mb] = 1;
            }
            if (mb >= nMB) break;
            if (!hb_more(&b)) break;  // trailing skip run ended the slice
        }

        const int my = mb / mb_w, mx = mb % mb_w;
        int mbt = (int)hb_ue(&b);
        if (b.error) FAIL(-2);

        int kind, imode16 = 0, cbp = 0, chroma_mode = 0;
        int t8_ok = 1;   // inter MB may carry transform_size_8x8_flag
        int intra_mbt = mbt;
        if (is_b) {
            if (mbt >= 23) intra_mbt = mbt - 23;
            else intra_mbt = -1;
        } else if (is_p) {
            if (mbt >= 5) intra_mbt = mbt - 5;
            else intra_mbt = -1;
        }

        if (is_b && intra_mbt < 0) {
            // ---------------- inter MB (B, 16x16 family) ----------
            // mbt 1 = B_L0_16x16, 2 = B_L1_16x16, 3 = B_Bi_16x16;
            // direct (0), partitions and B_8x8 (4..22) are not in the
            // supported profile point
            if (mbt == 0 || mbt > 3) FAIL(-8);
            kind = K_INTER;
            const int use0 = mbt == 1 || mbt == 3;
            const int use1 = mbt == 2 || mbt == 3;
            int x4 = mx * 4, y4 = my * 4;
            int r0 = -1, r1 = -1;
            if (use0) r0 = hb_te(&b, num_ref_idx_l0 - 1);
            if (use1) r1 = hb_te(&b, num_ref_idx_l1 - 1);
            for (int list = 0; list < 2; list++) {
                const int use = list ? use1 : use0;
                const int rr = list ? r1 : r0;
                // operate on this list's grids via pointer swap
                int16_t* sm = c.mvg; int8_t* sr_ = c.refg;
                if (list) { c.mvg = c.mvg1; c.refg = c.refg1; }
                if (use) {
                    int mvdx = hb_se(&b), mvdy = hb_se(&b);
                    int px, py;
                    mv_pred(&c, x4, y4, 4, 4, rr, 0, &px, &py);
                    fill_part(&c, x4, y4, 4, 4, rr, px + mvdx,
                              py + mvdy);
                } else {
                    fill_part(&c, x4, y4, 4, 4, -1, 0, 0);
                }
                if (list) { c.mvg = sm; c.refg = sr_; }
            }
            if (b.error) FAIL(-2);
            for (int i = 0; i < 4; i++) {
                ref_out[mb * 4 + i] = (int8_t)r0;
                ref1_out[mb * 4 + i] = (int8_t)r1;
            }
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
                    int gi = (y4 + y) * c.w4 + x4 + x;
                    mv_out[(mb * 16 + y * 4 + x) * 2] = c.mvg[gi * 2];
                    mv_out[(mb * 16 + y * 4 + x) * 2 + 1] =
                        c.mvg[gi * 2 + 1];
                    mv1_out[(mb * 16 + y * 4 + x) * 2] = c.mvg1[gi * 2];
                    mv1_out[(mb * 16 + y * 4 + x) * 2 + 1] =
                        c.mvg1[gi * 2 + 1];
                }
            unsigned cg = hb_ue(&b);
            if (cg > 47 || b.error) FAIL(-4);
            cbp = GOLOMB_TO_INTER_CBP[cg];
        } else if (intra_mbt < 0) {
            // ---------------- inter MB (P) ----------------
            kind = K_INTER;
            int refs[4] = {0, 0, 0, 0};
            int x4 = mx * 4, y4 = my * 4;
            if (mbt == 0) {                       // P_L0_16x16
                refs[0] = hb_te(&b, num_ref_idx_l0 - 1);
                int mvdx = hb_se(&b), mvdy = hb_se(&b);
                int px, py;
                mv_pred(&c, x4, y4, 4, 4, refs[0], 0, &px, &py);
                fill_part(&c, x4, y4, 4, 4, refs[0], px + mvdx, py + mvdy);
                refs[1] = refs[2] = refs[3] = refs[0];
            } else if (mbt == 1) {                // P_L0_L0_16x8
                int r0 = hb_te(&b, num_ref_idx_l0 - 1);
                int r1 = hb_te(&b, num_ref_idx_l0 - 1);
                int d0x = hb_se(&b), d0y = hb_se(&b);
                int d1x = hb_se(&b), d1y = hb_se(&b);
                int px, py;
                mv_pred(&c, x4, y4, 4, 2, r0, 1, &px, &py);
                fill_part(&c, x4, y4, 4, 2, r0, px + d0x, py + d0y);
                mv_pred(&c, x4, y4 + 2, 4, 2, r1, 2, &px, &py);
                fill_part(&c, x4, y4 + 2, 4, 2, r1, px + d1x, py + d1y);
                refs[0] = refs[1] = r0; refs[2] = refs[3] = r1;
            } else if (mbt == 2) {                // P_L0_L0_8x16
                int r0 = hb_te(&b, num_ref_idx_l0 - 1);
                int r1 = hb_te(&b, num_ref_idx_l0 - 1);
                int d0x = hb_se(&b), d0y = hb_se(&b);
                int d1x = hb_se(&b), d1y = hb_se(&b);
                int px, py;
                mv_pred(&c, x4, y4, 2, 4, r0, 3, &px, &py);
                fill_part(&c, x4, y4, 2, 4, r0, px + d0x, py + d0y);
                mv_pred(&c, x4 + 2, y4, 2, 4, r1, 4, &px, &py);
                fill_part(&c, x4 + 2, y4, 2, 4, r1, px + d1x, py + d1y);
                refs[0] = refs[2] = r0; refs[1] = refs[3] = r1;
            } else if (mbt == 3 || mbt == 4) {    // P_8x8 / P_8x8ref0
                int sub[4];
                for (int i = 0; i < 4; i++) {
                    sub[i] = (int)hb_ue(&b);
                    if (sub[i] > 3) FAIL(-3);
                    if (sub[i] != 0) t8_ok = 0;
                }
                if (mbt == 3)
                    for (int i = 0; i < 4; i++)
                        refs[i] = hb_te(&b, num_ref_idx_l0 - 1);
                for (int i = 0; i < 4; i++) {
                    int bx4 = x4 + (i & 1) * 2, by4 = y4 + (i >> 1) * 2;
                    // sub_mb_type: 0=8x8(1), 1=8x4(2), 2=4x8(2), 3=4x4(4)
                    static const int NPART[4] = {1, 2, 2, 4};
                    static const int PW[4] = {2, 2, 1, 1};
                    static const int PH[4] = {2, 1, 2, 1};
                    int np = NPART[sub[i]], pw = PW[sub[i]], ph = PH[sub[i]];
                    for (int p = 0; p < np; p++) {
                        int ox = 0, oy = 0;
                        if (sub[i] == 1) oy = p;          // 8x4: stacked
                        else if (sub[i] == 2) ox = p;     // 4x8: side-by-side
                        else if (sub[i] == 3) { ox = p & 1; oy = p >> 1; }
                        int sx = bx4 + ox * pw, sy = by4 + oy * ph;
                        int dx = hb_se(&b), dyv = hb_se(&b);
                        int px, py;
                        mv_pred(&c, sx, sy, pw, ph, refs[i], 0, &px, &py);
                        fill_part(&c, sx, sy, pw, ph, refs[i],
                                  px + dx, py + dyv);
                    }
                }
            } else {
                FAIL(-3);
            }
            if (b.error) FAIL(-2);
            for (int i = 0; i < 4; i++)
                ref_out[mb * 4 + i] = (int8_t)refs[i];
            // export the MB's per-4x4 motion field + mark intra grid
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
                    mv_out[(mb * 16 + y * 4 + x) * 2] =
                        c.mvg[((y4 + y) * c.w4 + x4 + x) * 2];
                    mv_out[(mb * 16 + y * 4 + x) * 2 + 1] =
                        c.mvg[((y4 + y) * c.w4 + x4 + x) * 2 + 1];
                }
            // coded_block_pattern (inter mapping)
            unsigned cg = hb_ue(&b);
            if (cg > 47 || b.error) FAIL(-4);
            cbp = GOLOMB_TO_INTER_CBP[cg];
        } else if (intra_mbt == 0) {
            // ---------------- I_NxN (I_4x4 / I_8x8) ----------------
            // transform_size_8x8_flag comes right after mb_type
            // (§7.3.5); I_8x8 codes 4 prediction modes with the same
            // prev/rem syntax, predicted from the 4x4 mode grid cells
            // adjacent to each 8x8's top-left corner (§8.3.2.1)
            int t8i = transform_8x8_mode ? hb_read1(&b) : 0;
            kind = t8i ? K_I8X8 : K_I4X4;
            int x4 = mx * 4, y4 = my * 4;
            int8_t modes[16];
            if (t8i) {
                for (int i = 0; i < 16; i++) modes[i] = 0;
                for (int b8 = 0; b8 < 4; b8++) {
                    int by = (b8 >> 1) * 2, bx = (b8 & 1) * 2;
                    int gx = x4 + bx, gy = y4 + by;
                    int8_t ma = gx > 0 ? c.i4g[gy * c.w4 + gx - 1] : -2;
                    int8_t mbv = gy > 0 ? c.i4g[(gy - 1) * c.w4 + gx]
                                        : -2;
                    int pred;
                    if (ma == -2 || mbv == -2) pred = 2;
                    else {
                        int a = ma < 0 ? 2 : ma, bb = mbv < 0 ? 2 : mbv;
                        pred = a < bb ? a : bb;
                    }
                    int mode;
                    if (hb_read1(&b)) mode = pred;
                    else {
                        int rem = (int)hb_read(&b, 3);
                        mode = rem < pred ? rem : rem + 1;
                    }
                    modes[b8] = (int8_t)mode;
                    for (int y = 0; y < 2; y++)
                        for (int x = 0; x < 2; x++)
                            c.i4g[(gy + y) * c.w4 + gx + x] =
                                (int8_t)mode;
                }
                memcpy(i4modes + mb * 16, modes, 16);
                chroma_mode = (int)hb_ue(&b);
                unsigned cg8 = hb_ue(&b);
                if (cg8 > 47 || b.error) FAIL(-4);
                cbp = GOLOMB_TO_INTRA4X4_CBP[cg8];
                for (int i = 0; i < 4; i++) ref_out[mb * 4 + i] = -1;
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++) {
                        c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
                        c.refg1[(y4 + y) * c.w4 + x4 + x] = -1;
                    }
                goto residuals;
            }
            for (int blk = 0; blk < 16; blk++) {
                int by = BLK4[blk][0], bx = BLK4[blk][1];
                int gx = x4 + bx, gy = y4 + by;
                // predicted mode (§8.3.1.1): DC if A or B unavailable;
                // non-I4x4 neighbors predict as DC
                int8_t ma = gx > 0 ? c.i4g[gy * c.w4 + gx - 1] : -2;
                int8_t mbv = gy > 0 ? c.i4g[(gy - 1) * c.w4 + gx] : -2;
                int pred;
                if (ma == -2 || mbv == -2) pred = 2;
                else {
                    int a = ma < 0 ? 2 : ma, bb = mbv < 0 ? 2 : mbv;
                    pred = a < bb ? a : bb;
                }
                int mode;
                if (hb_read1(&b)) mode = pred;
                else {
                    int rem = (int)hb_read(&b, 3);
                    mode = rem < pred ? rem : rem + 1;
                }
                modes[by * 4 + bx] = (int8_t)mode;  // raster within MB
                c.i4g[gy * c.w4 + gx] = (int8_t)mode;
            }
            memcpy(i4modes + mb * 16, modes, 16);
            chroma_mode = (int)hb_ue(&b);
            unsigned cg = hb_ue(&b);
            if (cg > 47 || b.error) FAIL(-4);
            cbp = GOLOMB_TO_INTRA4X4_CBP[cg];
            for (int i = 0; i < 4; i++) ref_out[mb * 4 + i] = -1;
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.refg1[(y4 + y) * c.w4 + x4 + x] = -1;
                }
        } else if (intra_mbt <= 24) {
            // ---------------- I_16x16 ----------------
            kind = K_I16;
            int t = intra_mbt - 1;
            imode16 = t % 4;
            cbp = ((t / 4) % 3) << 4;
            if (t >= 12) cbp |= 15;
            chroma_mode = (int)hb_ue(&b);
            for (int i = 0; i < 4; i++) ref_out[mb * 4 + i] = -1;
            int x4 = mx * 4, y4 = my * 4;
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.refg1[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
                }
        } else {
            // ---------------- I_PCM (intra_mbt == 25) ----------------
            // pcm_alignment_zero_bit(s) then 256 luma + 2x64 chroma raw
            // bytes (§7.3.5, 4:2:0 8-bit). Pixels travel to the recon
            // layer through the coeffs rows (384 int16 slots of the
            // MB's 27x16 block).
            b.pos = (b.pos + 7) & ~7;
            if (b.pos + 384 * 8 > b.nbits) FAIL(-2);
            int16_t* mbco = coeffs + (size_t)mb * 27 * 16;
            for (int k = 0; k < 384; k++)
                mbco[k] = (int16_t)hb_read(&b, 8);
            int16_t* mbnc = ncoef + (size_t)mb * 27;
            for (int k = 0; k < 27; k++) mbnc[k] = 16;
            // deblocking quantizer is 0 (h264_cavlc.c:754); the slice
            // qp PREDICTOR is unchanged. All nnz contexts read 16.
            qp_out[mb] = 0;
            int x4 = mx * 4, y4 = my * 4;
            for (int i = 0; i < 4; i++) ref_out[mb * 4 + i] = -1;
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.refg1[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.tcY[(y4 + y) * c.w4 + x4 + x] = 16;
                }
            for (int y = 0; y < 2; y++)
                for (int x = 0; x < 2; x++) {
                    c.tcU[(my * 2 + y) * c.wc + mx * 2 + x] = 16;
                    c.tcV[(my * 2 + y) * c.wc + mx * 2 + x] = 16;
                }
            mb_kind[mb] = K_IPCM;
            mb_info[mb] = 0;
            c.decoded[mb] = 1;
            mb++;
            if (!is_p && !hb_more(&b)) break;
            continue;
        }
        if (b.error) FAIL(-2);

residuals:;
        int cbp_luma = cbp & 15;
        int cbp_chroma = (cbp >> 4) & 3;

        // inter transform_size_8x8_flag (§7.3.5): after CBP, only when
        // luma residual is coded and no partition is below 8x8
        int t8 = kind == K_I8X8;
        if (kind == K_INTER && transform_8x8_mode && cbp_luma && t8_ok)
            t8 = hb_read1(&b);

        // mb_qp_delta: present for I_16x16 always, else when cbp != 0
        if (kind == K_I16 || cbp != 0) {
            int dq = hb_se(&b);
            if (b.error) FAIL(-2);
            qp = qp + dq;
            if (qp < 0) qp += 52;
            if (qp > 51) qp -= 52;
        }
        qp_out[mb] = qp;

        // ---------------- residuals ----------------
        int16_t* mbco = coeffs + (size_t)mb * 27 * 16;
        int16_t* mbnc = ncoef + (size_t)mb * 27;
        int x4 = mx * 4, y4 = my * 4;

        if (kind == K_I16) {
            int nc0 = tc_nc(c.tcY, c.w4, y4, x4);
            int t = residual_block(&b, mbco + 0, 16, nc0);
            if (t < 0) FAIL(-6);
            mbnc[0] = (int16_t)t;
        }
        if (t8) {
            // 8x8 transform: each coded 8x8 group is read as 4
            // interleaved 4x4 scans; level k of sub-read i lands at
            // 8x8-zigzag index 4k+i (§8.5.6). Stored as the 64 zigzag
            // levels in rows 1+4g..4+4g. nC cache keeps per-sub
            // totals, with the group's top-left cell accumulating the
            // sum (h264_cavlc.c:644 residual-context semantics);
            // ncoef carries the DEBLOCK view instead: every cell of a
            // group = group-coded bit (h264_slice.c:2413 cache
            // override).
            for (int i8 = 0; i8 < 4; i8++) {
                int present = (cbp_luma >> i8) & 1;
                int16_t* g64 = mbco + (size_t)(1 + 4 * i8) * 16;
                int sum = 0;
                if (present) {
                    for (int i4 = 0; i4 < 4; i4++) {
                        int blk = 4 * i8 + i4;
                        int by = BLK4[blk][0], bx = BLK4[blk][1];
                        int gy = y4 + by, gx = x4 + bx;
                        int nc = tc_nc(c.tcY, c.w4, gy, gx);
                        int16_t tmp[16];
                        for (int k = 0; k < 16; k++) tmp[k] = 0;
                        int t = residual_block(&b, tmp, 16, nc);
                        if (t < 0) FAIL(-6);
                        for (int k = 0; k < 16; k++)
                            g64[4 * k + i4] = tmp[k];
                        c.tcY[gy * c.w4 + gx] = (int8_t)t;
                        sum += t;
                    }
                    int by0 = BLK4[4 * i8][0], bx0 = BLK4[4 * i8][1];
                    c.tcY[(y4 + by0) * c.w4 + x4 + bx0] = (int8_t)sum;
                }
                int any = 0;
                for (int k = 0; k < 64 && !any; k++) any |= g64[k] != 0;
                for (int i4 = 0; i4 < 4; i4++) {
                    int blk = 4 * i8 + i4;
                    int by = BLK4[blk][0], bx = BLK4[blk][1];
                    if (!present)
                        c.tcY[(y4 + by) * c.w4 + x4 + bx] = 0;
                    mbnc[1 + by * 4 + bx] = (int16_t)any;
                }
            }
            goto chroma_resid;
        }
        // luma 4x4 blocks in §6.4.3 order
        for (int blk = 0; blk < 16; blk++) {
            int by = BLK4[blk][0], bx = BLK4[blk][1];
            int gy = y4 + by, gx = x4 + bx;
            int i8 = blk >> 2;               // 8x8 group in scan order
            int present = kind == K_I16 ? (cbp_luma != 0)
                                        : ((cbp_luma >> i8) & 1);
            int16_t* out = mbco + (size_t)(1 + by * 4 + bx) * 16;
            if (present) {
                int nc = tc_nc(c.tcY, c.w4, gy, gx);
                int t;
                if (kind == K_I16)
                    t = residual_block(&b, out + 1, 15, nc);
                else
                    t = residual_block(&b, out, 16, nc);
                if (t < 0) FAIL(-6);
                c.tcY[gy * c.w4 + gx] = (int8_t)t;
                mbnc[1 + by * 4 + bx] = (int16_t)t;
            } else {
                c.tcY[gy * c.w4 + gx] = 0;
            }
        }
chroma_resid:;
        // chroma DC
        if (cbp_chroma) {
            for (int ch = 0; ch < 2; ch++) {
                int t = residual_block(&b, mbco + (size_t)(17 + ch) * 16,
                                       4, -1);
                if (t < 0) FAIL(-6);
                mbnc[17 + ch] = (int16_t)t;
            }
        }
        // chroma AC
        for (int ch = 0; ch < 2; ch++) {
            int8_t* tg = ch == 0 ? c.tcU : c.tcV;
            for (int blk = 0; blk < 4; blk++) {
                int by = blk >> 1, bx = blk & 1;
                int gy = my * 2 + by, gx = mx * 2 + bx;
                if (cbp_chroma == 2) {
                    int nc = tc_nc(tg, c.wc, gy, gx);
                    int16_t* out = mbco +
                        (size_t)(19 + ch * 4 + by * 2 + bx) * 16;
                    int t = residual_block(&b, out + 1, 15, nc);
                    if (t < 0) FAIL(-6);
                    tg[gy * c.wc + gx] = (int8_t)t;
                    mbnc[19 + ch * 4 + by * 2 + bx] = (int16_t)t;
                } else {
                    tg[gy * c.wc + gx] = 0;
                }
            }
        }

        mb_kind[mb] = kind;
        mb_info[mb] = imode16 | (chroma_mode << 4) | (cbp << 8)
                      | (t8 ? INFO_T8 : 0);
        c.decoded[mb] = 1;
        mb++;
        if (!is_p && !hb_more(&b)) break;
    }

    end_state[0] = b.pos;
    end_state[1] = mb;

done:
    free(c.tcY); free(c.tcU); free(c.tcV);
    free(c.mvg); free(c.refg); free(c.i4g); free(c.decoded);
    free(c.mvg1); free(c.refg1);
    return err;
    #undef FAIL
}

// ---------------------------------------------------------------------------
// In-loop deblocking filter (§8.7), frame_mbs_only, 4:2:0
// ---------------------------------------------------------------------------

namespace {

// spec tables (Table 8-16 / 8-17; cf. h264_loopfilter.c:37-104)
static const uint8_t ALPHA[52] = {
    0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,
    4,4,5,6,7,8,9,10,12,13,15,17,20,22,25,28,32,36,40,45,50,56,63,71,
    80,90,101,113,127,144,162,182,203,226,255,255};
static const uint8_t BETA[52] = {
    0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,
    2,2,2,3,3,3,3,4,4,4,6,6,7,7,8,8,9,9,10,10,11,11,12,12,
    13,13,14,14,15,15,16,16,17,17,18,18};
static const uint8_t TC0[52][3] = {
    {0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},
    {0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},{0,0,0},
    {0,0,0},{0,0,1},{0,0,1},{0,0,1},{0,0,1},{0,1,1},{0,1,1},{1,1,1},
    {1,1,1},{1,1,1},{1,1,1},{1,1,2},{1,1,2},{1,1,2},{1,1,2},{1,2,3},
    {1,2,3},{2,2,3},{2,2,4},{2,3,4},{2,3,4},{3,3,5},{3,4,6},{3,4,6},
    {4,5,7},{4,5,8},{4,6,9},{5,7,10},{6,8,11},{6,8,13},{7,10,14},
    {8,11,16},{9,12,18},{10,13,20},{11,15,23},{13,17,25}};
static const uint8_t CHROMA_QP[52] = {
    0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,
    25,26,27,28,29,29,30,31,32,32,33,34,34,35,35,36,36,37,37,37,38,38,
    38,39,39,39,39};

inline int iclip(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
inline int iabs(int v) { return v < 0 ? -v : v; }

// filter one line of a luma edge; p/q point at p0/q0, pstep walks away
// from the edge on the p side (and toward q)
inline void filt_line_luma(uint8_t* line, int step, int bS,
                           int alpha, int beta, int tc0v) {
    int p0 = line[-step], p1 = line[-2 * step], p2 = line[-3 * step];
    int p3 = line[-4 * step];
    int q0 = line[0], q1 = line[step], q2 = line[2 * step];
    int q3 = line[3 * step];
    if (iabs(p0 - q0) >= alpha || iabs(p1 - p0) >= beta ||
        iabs(q1 - q0) >= beta)
        return;
    int ap = iabs(p2 - p0), aq = iabs(q2 - q0);
    if (bS < 4) {
        int tc = tc0v + (ap < beta) + (aq < beta);
        int delta = iclip((((q0 - p0) * 4) + (p1 - q1) + 4) >> 3, -tc, tc);
        line[-step] = (uint8_t)iclip(p0 + delta, 0, 255);
        line[0] = (uint8_t)iclip(q0 - delta, 0, 255);
        if (ap < beta)
            line[-2 * step] = (uint8_t)(p1 + iclip(
                (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0v, tc0v));
        if (aq < beta)
            line[step] = (uint8_t)(q1 + iclip(
                (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0v, tc0v));
    } else {
        if (ap < beta && iabs(p0 - q0) < ((alpha >> 2) + 2)) {
            line[-step] = (uint8_t)((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4)
                                    >> 3);
            line[-2 * step] = (uint8_t)((p2 + p1 + p0 + q0 + 2) >> 2);
            line[-3 * step] = (uint8_t)((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4)
                                        >> 3);
        } else {
            line[-step] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
        }
        if (aq < beta && iabs(p0 - q0) < ((alpha >> 2) + 2)) {
            line[0] = (uint8_t)((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3);
            line[step] = (uint8_t)((q2 + q1 + q0 + p0 + 2) >> 2);
            line[2 * step] = (uint8_t)((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4)
                                       >> 3);
        } else {
            line[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
        }
    }
}

inline void filt_line_chroma(uint8_t* line, int step, int bS,
                             int alpha, int beta, int tc0v) {
    int p0 = line[-step], p1 = line[-2 * step];
    int q0 = line[0], q1 = line[step];
    if (iabs(p0 - q0) >= alpha || iabs(p1 - p0) >= beta ||
        iabs(q1 - q0) >= beta)
        return;
    if (bS < 4) {
        int tc = tc0v + 1;
        int delta = iclip((((q0 - p0) * 4) + (p1 - q1) + 4) >> 3, -tc, tc);
        line[-step] = (uint8_t)iclip(p0 + delta, 0, 255);
        line[0] = (uint8_t)iclip(q0 - delta, 0, 255);
    } else {
        line[-step] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
        line[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
    }
}

struct DeblockCtx {
    const int32_t* mb_kind;
    const int32_t* qp_arr;
    const int16_t* mv;       // [nMB*16*2] raster within MB
    const int8_t* refidx;    // [nMB*4]
    const int16_t* ncoef;    // [nMB*27]
    int mb_w, mb_h;
    // list 1 (B slices; null for P) + refIdx -> picture-id maps
    const int16_t* mv1;
    const int8_t* refidx1;
    const int32_t* l0pic;
    const int32_t* l1pic;
};

// one side's motion for a 4x4: returns count; fills pic[2], mx[2], my[2]
inline int side_motion(const DeblockCtx* d, int mbi, int blk, int b8,
                       int* pic, int* mx, int* my) {
    int n = 0;
    int r0 = d->refidx[mbi * 4 + b8];
    if (r0 >= 0) {
        pic[n] = d->l0pic ? d->l0pic[r0] : r0;
        mx[n] = d->mv[(mbi * 16 + blk) * 2];
        my[n] = d->mv[(mbi * 16 + blk) * 2 + 1];
        n++;
    }
    if (d->refidx1) {
        int r1 = d->refidx1[mbi * 4 + b8];
        if (r1 >= 0) {
            pic[n] = d->l1pic ? d->l1pic[r1] : (0x10000 + r1);
            mx[n] = d->mv1[(mbi * 16 + blk) * 2];
            my[n] = d->mv1[(mbi * 16 + blk) * 2 + 1];
            n++;
        }
    }
    return n;
}

inline int mv_far(int ax, int ay, int bx, int by) {
    return iabs(ax - bx) >= 4 || iabs(ay - by) >= 4;
}

inline int is_intra_kind(int k) { return k >= 2; }

// bS for edge between 4x4 luma blocks p=(pxb,pyb) and q=(qxb,qyb)
// (frame-wide 4x4 coords); mb_edge = crossing an MB boundary
int edge_bs(const DeblockCtx* d, int pxb, int pyb, int qxb, int qyb,
            int mb_edge) {
    int pmb = (pyb / 4) * d->mb_w + (pxb / 4);
    int qmb = (qyb / 4) * d->mb_w + (qxb / 4);
    int pk = d->mb_kind[pmb], qk = d->mb_kind[qmb];
    if (is_intra_kind(pk) || is_intra_kind(qk))
        return mb_edge ? 4 : 3;
    int pnz = d->ncoef[pmb * 27 + 1 + (pyb % 4) * 4 + (pxb % 4)] != 0;
    int qnz = d->ncoef[qmb * 27 + 1 + (qyb % 4) * 4 + (qxb % 4)] != 0;
    // Intra_16x16 DC-only blocks never reach here (intra => bS>=3)
    if (pnz || qnz) return 2;
    int pblk = (pyb % 4) * 4 + (pxb % 4), pb8 = ((pyb % 4) / 2) * 2
        + (pxb % 4) / 2;
    int qblk = (qyb % 4) * 4 + (qxb % 4), qb8 = ((qyb % 4) / 2) * 2
        + (qxb % 4) / 2;
    int ppic[2], pmx[2], pmy[2], qpic[2], qmx[2], qmy[2];
    int np_ = side_motion(d, pmb, pblk, pb8, ppic, pmx, pmy);
    int nq = side_motion(d, qmb, qblk, qb8, qpic, qmx, qmy);
    if (np_ != nq) return 1;
    if (np_ == 1) {
        if (ppic[0] != qpic[0]) return 1;
        return mv_far(pmx[0], pmy[0], qmx[0], qmy[0]) ? 1 : 0;
    }
    // two motion vectors each: picture multisets must match (§8.7.2.1)
    int same_straight = ppic[0] == qpic[0] && ppic[1] == qpic[1];
    int same_cross = ppic[0] == qpic[1] && ppic[1] == qpic[0];
    if (!same_straight && !same_cross) return 1;
    if (ppic[0] == ppic[1]) {
        // both refs are the same picture: either vector pairing may
        // satisfy the closeness condition
        int a = mv_far(pmx[0], pmy[0], qmx[0], qmy[0])
             || mv_far(pmx[1], pmy[1], qmx[1], qmy[1]);
        int b = mv_far(pmx[0], pmy[0], qmx[1], qmy[1])
             || mv_far(pmx[1], pmy[1], qmx[0], qmy[0]);
        return (a && b) ? 1 : 0;
    }
    if (same_straight)
        return (mv_far(pmx[0], pmy[0], qmx[0], qmy[0])
                || mv_far(pmx[1], pmy[1], qmx[1], qmy[1])) ? 1 : 0;
    return (mv_far(pmx[0], pmy[0], qmx[1], qmy[1])
            || mv_far(pmx[1], pmy[1], qmx[0], qmy[0])) ? 1 : 0;
}

}  // namespace

// Deblock a full frame in place (disable_deblocking_filter_idc == 0).
extern "C" void h264_deblock_frame(
    uint8_t* Y, uint8_t* U, uint8_t* V,
    int width, int height,
    const int32_t* mb_kind, const int32_t* qp_arr,
    const int16_t* mv, const int8_t* refidx, const int16_t* ncoef,
    int mb_w, int mb_h,
    int alpha_off, int beta_off, int chroma_qp_off,
    const int16_t* mv1, const int8_t* refidx1,
    const int32_t* l0pic, const int32_t* l1pic,
    const int32_t* mb_info, int cqp_off2)
{
    DeblockCtx d;
    d.mb_kind = mb_kind; d.qp_arr = qp_arr; d.mv = mv;
    d.refidx = refidx; d.ncoef = ncoef; d.mb_w = mb_w; d.mb_h = mb_h;
    d.mv1 = mv1; d.refidx1 = refidx1; d.l0pic = l0pic; d.l1pic = l1pic;
    const int cw = width / 2;

    for (int my = 0; my < mb_h; my++) {
        for (int mx = 0; mx < mb_w; mx++) {
            const int mb = my * mb_w + mx;
            const int qpq = qp_arr[mb];
            // ---- vertical luma edges (filter columns x = mx*16 + e*4)
            const int t8mb = mb_info
                && (mb_info[mb] & INFO_T8) != 0;
            for (int e = 0; e < 4; e++) {
                if (e == 0 && mx == 0) continue;
                if (t8mb && (e & 1)) continue;  // 8x8: no inner 4x4 edges
                const int qpp = e == 0 ? qp_arr[mb - 1] : qpq;
                const int qpav = (qpp + qpq + 1) >> 1;
                const int ia = iclip(qpav + alpha_off, 0, 51);
                const int ib = iclip(qpav + beta_off, 0, 51);
                const int alpha = ALPHA[ia], beta = BETA[ib];
                if (!alpha) continue;
                const int gx = mx * 4 + e;           // q block column (4x4)
                for (int r4 = 0; r4 < 4; r4++) {     // 4x4 block rows
                    const int gy = my * 4 + r4;
                    const int bS = edge_bs(&d, gx - 1, gy, gx, gy, e == 0);
                    if (!bS) continue;
                    const int tc0v = bS < 4 ? TC0[ia][bS - 1] : 0;
                    for (int r = 0; r < 4; r++) {
                        uint8_t* line = Y + (size_t)(gy * 4 + r) * width
                                        + gx * 4;
                        filt_line_luma(line, 1, bS, alpha, beta, tc0v);
                    }
                }
            }
            // ---- horizontal luma edges
            for (int e = 0; e < 4; e++) {
                if (e == 0 && my == 0) continue;
                if (t8mb && (e & 1)) continue;  // 8x8: no inner 4x4 edges
                const int qpp = e == 0 ? qp_arr[mb - mb_w] : qpq;
                const int qpav = (qpp + qpq + 1) >> 1;
                const int ia = iclip(qpav + alpha_off, 0, 51);
                const int ib = iclip(qpav + beta_off, 0, 51);
                const int alpha = ALPHA[ia], beta = BETA[ib];
                if (!alpha) continue;
                const int gy = my * 4 + e;
                for (int c4 = 0; c4 < 4; c4++) {
                    const int gx = mx * 4 + c4;
                    const int bS = edge_bs(&d, gx, gy - 1, gx, gy, e == 0);
                    if (!bS) continue;
                    const int tc0v = bS < 4 ? TC0[ia][bS - 1] : 0;
                    for (int cc = 0; cc < 4; cc++) {
                        uint8_t* line = Y + (size_t)(gy * 4) * width
                                        + gx * 4 + cc;
                        filt_line_luma(line, width, bS, alpha, beta, tc0v);
                    }
                }
            }
            // ---- chroma edges (4:2:0): vertical cx in {0,4}, horizontal
            // cy in {0,4}; bS taken from the co-located luma blocks
            for (int pl = 0; pl < 2; pl++) {
                uint8_t* C = pl == 0 ? U : V;
                const int cqo = pl == 0 ? chroma_qp_off : cqp_off2;
                // vertical
                for (int e = 0; e < 2; e++) {
                    if (e == 0 && mx == 0) continue;
                    const int qpp = e == 0 ? qp_arr[mb - 1] : qpq;
                    const int qa = CHROMA_QP[iclip(qpp + cqo, 0, 51)];
                    const int qb = CHROMA_QP[iclip(qpq + cqo, 0, 51)];
                    const int qpav = (qa + qb + 1) >> 1;
                    const int ia = iclip(qpav + alpha_off, 0, 51);
                    const int ibt = iclip(qpav + beta_off, 0, 51);
                    const int alpha = ALPHA[ia], beta = BETA[ibt];
                    if (!alpha) continue;
                    const int gx = mx * 4 + e * 2;   // luma 4x4 column
                    for (int r4 = 0; r4 < 4; r4++) {
                        const int gy = my * 4 + r4;
                        const int bS = edge_bs(&d, gx - 1, gy, gx, gy,
                                               e == 0);
                        if (!bS) continue;
                        const int tc0v = bS < 4 ? TC0[ia][bS - 1] : 0;
                        for (int r = 0; r < 2; r++) {
                            uint8_t* line = C +
                                (size_t)(gy * 2 + r) * cw + gx * 2;
                            filt_line_chroma(line, 1, bS, alpha, beta,
                                             tc0v);
                        }
                    }
                }
                // horizontal
                for (int e = 0; e < 2; e++) {
                    if (e == 0 && my == 0) continue;
                    const int qpp = e == 0 ? qp_arr[mb - mb_w] : qpq;
                    const int qa = CHROMA_QP[iclip(qpp + cqo, 0, 51)];
                    const int qb = CHROMA_QP[iclip(qpq + cqo, 0, 51)];
                    const int qpav = (qa + qb + 1) >> 1;
                    const int ia = iclip(qpav + alpha_off, 0, 51);
                    const int ibt = iclip(qpav + beta_off, 0, 51);
                    const int alpha = ALPHA[ia], beta = BETA[ibt];
                    if (!alpha) continue;
                    const int gy = my * 4 + e * 2;
                    for (int c4 = 0; c4 < 4; c4++) {
                        const int gx = mx * 4 + c4;
                        const int bS = edge_bs(&d, gx, gy - 1, gx, gy,
                                               e == 0);
                        if (!bS) continue;
                        const int tc0v = bS < 4 ? TC0[ia][bS - 1] : 0;
                        for (int cc = 0; cc < 2; cc++) {
                            uint8_t* line = C + (size_t)(gy * 2) * cw
                                            + gx * 2 + cc;
                            filt_line_chroma(line, cw, bS, alpha, beta,
                                             tc0v);
                        }
                    }
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Intra macroblock reconstruction (§8.3) — the serial neighbor-dependent
// pixel pass. Inter MBs are already reconstructed (device/batched);
// this walks intra MBs in raster order adding pred + residual in place.
// Math is the verified port of codecs/h264/recon.py pred4x4 /
// intra.py _pred16/_pred8 (bit-exact vs the reference decoder).
// ---------------------------------------------------------------------------

namespace {

inline uint8_t clip255(int v) { return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v)); }

// Intra_16x16 luma prediction into pred[256]
void pred16(const uint8_t* Y, int W, int my, int mx, int mode,
            int* pred, int av_t, int av_l) {
    const uint8_t* top = av_t ? Y + (size_t)(my * 16 - 1) * W + mx * 16
                              : nullptr;
    int y0 = my * 16, x0 = mx * 16;
    if (mode == 0) {                        // vertical
        for (int y = 0; y < 16; y++)
            for (int x = 0; x < 16; x++) pred[y * 16 + x] = top[x];
    } else if (mode == 1) {                 // horizontal
        for (int y = 0; y < 16; y++) {
            int l = Y[(size_t)(y0 + y) * W + x0 - 1];
            for (int x = 0; x < 16; x++) pred[y * 16 + x] = l;
        }
    } else if (mode == 2) {                 // DC
        int dc;
        if (av_t && av_l) {
            int s = 0;
            for (int x = 0; x < 16; x++) s += top[x];
            for (int y = 0; y < 16; y++) s += Y[(size_t)(y0 + y) * W + x0 - 1];
            dc = (s + 16) >> 5;
        } else if (av_t) {
            int s = 0;
            for (int x = 0; x < 16; x++) s += top[x];
            dc = (s + 8) >> 4;
        } else if (av_l) {
            int s = 0;
            for (int y = 0; y < 16; y++) s += Y[(size_t)(y0 + y) * W + x0 - 1];
            dc = (s + 8) >> 4;
        } else dc = 128;
        for (int i = 0; i < 256; i++) pred[i] = dc;
    } else {                                // plane
        int tl = Y[(size_t)(y0 - 1) * W + x0 - 1];
        int hsum = 0, vsum = 0;
        for (int i = 1; i <= 8; i++) {
            int a = top[7 + i];
            int b = (7 - i >= 0) ? top[7 - i] : tl;
            hsum += i * (a - b);
            int c = Y[(size_t)(y0 + 7 + i) * W + x0 - 1];
            int d = (7 - i >= 0) ? Y[(size_t)(y0 + 7 - i) * W + x0 - 1] : tl;
            vsum += i * (c - d);
        }
        int a = 16 * ((int)Y[(size_t)(y0 + 15) * W + x0 - 1] + (int)top[15]);
        int b = (5 * hsum + 32) >> 6;
        int c = (5 * vsum + 32) >> 6;
        for (int y = 0; y < 16; y++)
            for (int x = 0; x < 16; x++) {
                int v = (a + b * (x - 7) + c * (y - 7) + 16) >> 5;
                pred[y * 16 + x] = v < 0 ? 0 : (v > 255 ? 255 : v);
            }
    }
}

// chroma 8x8 prediction (modes: 0=DC quadrant, 1=H, 2=V, 3=plane)
void pred8c(const uint8_t* C, int W, int my, int mx, int mode,
            int* pred, int av_t, int av_l) {
    int y0 = my * 8, x0 = mx * 8;
    if (mode == 0) {
        for (int qy = 0; qy < 2; qy++)
            for (int qx = 0; qx < 2; qx++) {
                int ts = 0, ls = 0, has_t = av_t, has_l = av_l;
                if (has_t)
                    for (int x = 0; x < 4; x++)
                        ts += C[(size_t)(y0 - 1) * W + x0 + qx * 4 + x];
                if (has_l)
                    for (int y = 0; y < 4; y++)
                        ls += C[(size_t)(y0 + qy * 4 + y) * W + x0 - 1];
                int val;
                if (qy == 0 && qx == 1)
                    val = has_t ? (ts + 2) >> 2 : (has_l ? (ls + 2) >> 2 : 128);
                else if (qy == 1 && qx == 0)
                    val = has_l ? (ls + 2) >> 2 : (has_t ? (ts + 2) >> 2 : 128);
                else
                    val = (has_t && has_l) ? (ts + ls + 4) >> 3
                        : (has_t ? (ts + 2) >> 2 : (has_l ? (ls + 2) >> 2 : 128));
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++)
                        pred[(qy * 4 + y) * 8 + qx * 4 + x] = val;
            }
    } else if (mode == 1) {                 // horizontal
        for (int y = 0; y < 8; y++) {
            int l = C[(size_t)(y0 + y) * W + x0 - 1];
            for (int x = 0; x < 8; x++) pred[y * 8 + x] = l;
        }
    } else if (mode == 2) {                 // vertical
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++)
                pred[y * 8 + x] = C[(size_t)(y0 - 1) * W + x0 + x];
    } else {                                // plane
        int tl = C[(size_t)(y0 - 1) * W + x0 - 1];
        int hsum = 0, vsum = 0;
        for (int i = 1; i <= 4; i++) {
            int a = C[(size_t)(y0 - 1) * W + x0 + 3 + i];
            int b = (3 - i >= 0) ? C[(size_t)(y0 - 1) * W + x0 + 3 - i] : tl;
            hsum += i * (a - b);
            int c = C[(size_t)(y0 + 3 + i) * W + x0 - 1];
            int d = (3 - i >= 0) ? C[(size_t)(y0 + 3 - i) * W + x0 - 1] : tl;
            vsum += i * (c - d);
        }
        int a = 16 * ((int)C[(size_t)(y0 + 7) * W + x0 - 1]
                      + (int)C[(size_t)(y0 - 1) * W + x0 + 7]);
        int b = (17 * hsum + 16) >> 5;
        int c = (17 * vsum + 16) >> 5;
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int v = (a + b * (x - 3) + c * (y - 3) + 16) >> 5;
                pred[y * 8 + x] = v < 0 ? 0 : (v > 255 ? 255 : v);
            }
    }
}

// Intra_8x8 luma prediction (§8.3.2): low-pass reference-sample
// filtering (8.3.2.2.1) then the 9 modes (8.3.2.2.2-.10), expressed as
// diagonal-index loops over the filtered arrays. Behavioral reference:
// h264pred_template.c pred8x8l_* (availability/filtering corner rules).
void pred8l(const uint8_t* Y, int W, int w8, int gy8, int gx8,
            int mode, int* p, int mb_t, int mb_l, int mb_tr,
            int mb_tl) {
    // mb_*: availability of the neighbor MBs (frame edge + slice
    // boundary, §8.3 clause 6.4.9); intra-MB neighbors always exist
    const int y0 = gy8 * 8, x0 = gx8 * 8;
    const int b8y = gy8 & 1, b8x = gx8 & 1;
    const int avail_t = b8y ? 1 : mb_t;
    const int avail_l = b8x ? 1 : mb_l;
    const int avail_tl = (b8y && b8x) ? 1
        : (b8y ? avail_l && avail_t      /* block 2: left MB + in-MB */
           : (b8x ? mb_t : mb_tl));
    int avail_tr = 0;
    if (gy8 > 0 && gx8 + 1 < w8) {
        long cur = ((long)(gy8 >> 1) * (w8 >> 1) + (gx8 >> 1)) * 4
                   + (gy8 & 1) * 2 + (gx8 & 1);
        long tr = ((long)((gy8 - 1) >> 1) * (w8 >> 1) + ((gx8 + 1) >> 1))
                  * 4 + ((gy8 - 1) & 1) * 2 + ((gx8 + 1) & 1);
        avail_tr = tr < cur
            && (b8y ? 1 : (b8x ? mb_tr : mb_t));
    }
    int Tr[16], Lr[8], Cr = 128;           // raw neighbor samples
    for (int i = 0; i < 16; i++) Tr[i] = 128;
    for (int i = 0; i < 8; i++) Lr[i] = 128;
    if (avail_t) {
        for (int x = 0; x < 8; x++)
            Tr[x] = Y[(size_t)(y0 - 1) * W + x0 + x];
        if (avail_tr)
            for (int x = 8; x < 16; x++)
                Tr[x] = Y[(size_t)(y0 - 1) * W + x0 + x];
    }
    if (avail_l)
        for (int y = 0; y < 8; y++)
            Lr[y] = Y[(size_t)(y0 + y) * W + x0 - 1];
    if (avail_tl) Cr = Y[(size_t)(y0 - 1) * W + x0 - 1];
    // lt (modes 4/5/6): the reference's LOAD_TOPLEFT reads all three
    // corner samples straight from frame memory (h264pred_template.c:
    // PREDICT_8x8_LOAD_TOPLEFT has no availability guard), so compute
    // it frame-bounds-only -- conformant streams only use it when the
    // topleft really is available
    int ltF = 0;
    if (y0 > 0 && x0 > 0)
        ltF = (Y[(size_t)y0 * W + x0 - 1]
               + 2 * Y[(size_t)(y0 - 1) * W + x0 - 1]
               + Y[(size_t)(y0 - 1) * W + x0] + 2) >> 2;

    int t[16], l[8], lt = 0;
    if (avail_t) {
        t[0] = ((avail_tl ? Cr : Tr[0]) + 2 * Tr[0] + Tr[1] + 2) >> 2;
        for (int x = 1; x < 7; x++)
            t[x] = (Tr[x - 1] + 2 * Tr[x] + Tr[x + 1] + 2) >> 2;
        t[7] = ((avail_tr ? Tr[8] : Tr[7]) + 2 * Tr[7] + Tr[6] + 2) >> 2;
        if (avail_tr) {
            for (int x = 8; x < 15; x++)
                t[x] = (Tr[x - 1] + 2 * Tr[x] + Tr[x + 1] + 2) >> 2;
            t[15] = (Tr[14] + 3 * Tr[15] + 2) >> 2;
        } else {
            for (int x = 8; x < 16; x++) t[x] = Tr[7];   // RAW sample
        }
    } else {
        for (int x = 0; x < 16; x++) t[x] = 128;
    }
    if (avail_l) {
        l[0] = ((avail_tl ? Cr : Lr[0]) + 2 * Lr[0] + Lr[1] + 2) >> 2;
        for (int y = 1; y < 7; y++)
            l[y] = (Lr[y - 1] + 2 * Lr[y] + Lr[y + 1] + 2) >> 2;
        l[7] = (Lr[6] + 3 * Lr[7] + 2) >> 2;
    } else {
        for (int y = 0; y < 8; y++) l[y] = 128;
    }
    lt = ltF;

    switch (mode) {
    case 0:                                 // vertical
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) p[y * 8 + x] = t[x];
        break;
    case 1:                                 // horizontal
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) p[y * 8 + x] = l[y];
        break;
    case 2: {                               // DC (availability variants)
        int dc;
        if (avail_t && avail_l) {
            int st = 0, sl = 0;
            for (int i = 0; i < 8; i++) { st += t[i]; sl += l[i]; }
            dc = (st + sl + 8) >> 4;
        } else if (avail_t) {
            int st = 0;
            for (int i = 0; i < 8; i++) st += t[i];
            dc = (st + 4) >> 3;
        } else if (avail_l) {
            int sl = 0;
            for (int i = 0; i < 8; i++) sl += l[i];
            dc = (sl + 4) >> 3;
        } else dc = 128;
        for (int i = 0; i < 64; i++) p[i] = dc;
        break;
    }
    case 3:                                 // diagonal down-left
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int d = x + y;
                p[y * 8 + x] = d == 14
                    ? (t[14] + 3 * t[15] + 2) >> 2
                    : (t[d] + 2 * t[d + 1] + t[d + 2] + 2) >> 2;
            }
        break;
    case 4:                                 // diagonal down-right
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int d = x - y;
                if (d > 0)
                    p[y * 8 + x] = ((d >= 2 ? t[d - 2] : lt)
                                    + 2 * t[d - 1] + t[d] + 2) >> 2;
                else if (d < 0) {
                    int k = -d;
                    p[y * 8 + x] = (l[k] + 2 * l[k - 1]
                                    + (k >= 2 ? l[k - 2] : lt) + 2) >> 2;
                } else
                    p[y * 8 + x] = (l[0] + 2 * lt + t[0] + 2) >> 2;
            }
        break;
    case 5:                                 // vertical-right
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int z = 2 * x - y;
                if (z >= 0 && !(z & 1)) {
                    int m = z >> 1;
                    p[y * 8 + x] = ((m >= 1 ? t[m - 1] : lt)
                                    + t[m] + 1) >> 1;
                } else if (z > 0) {
                    int m = (z - 1) >> 1;
                    p[y * 8 + x] = ((m >= 1 ? t[m - 1] : lt)
                                    + 2 * t[m] + t[m + 1] + 2) >> 2;
                } else if (z == -1)
                    p[y * 8 + x] = (l[0] + 2 * lt + t[0] + 2) >> 2;
                else {
                    int k = -z;
                    p[y * 8 + x] = (l[k - 1] + 2 * l[k - 2]
                                    + (k >= 3 ? l[k - 3] : lt) + 2) >> 2;
                }
            }
        break;
    case 6:                                 // horizontal-down
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int z = 2 * y - x;
                if (z >= 0 && !(z & 1)) {
                    int m = z >> 1;
                    p[y * 8 + x] = ((m >= 1 ? l[m - 1] : lt)
                                    + l[m] + 1) >> 1;
                } else if (z > 0) {
                    int m = (z - 1) >> 1;
                    p[y * 8 + x] = ((m >= 1 ? l[m - 1] : lt)
                                    + 2 * l[m] + l[m + 1] + 2) >> 2;
                } else if (z == -1)
                    p[y * 8 + x] = (t[0] + 2 * lt + l[0] + 2) >> 2;
                else {
                    int k = -z;
                    p[y * 8 + x] = (t[k - 1] + 2 * t[k - 2]
                                    + (k >= 3 ? t[k - 3] : lt) + 2) >> 2;
                }
            }
        break;
    case 7:                                 // vertical-left
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int m = x + (y >> 1);
                p[y * 8 + x] = (y & 1)
                    ? (t[m] + 2 * t[m + 1] + t[m + 2] + 2) >> 2
                    : (t[m] + t[m + 1] + 1) >> 1;
            }
        break;
    default:                                // 8: horizontal-up
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int z = x + 2 * y;
                if (z > 13) p[y * 8 + x] = l[7];
                else if (z == 13)
                    p[y * 8 + x] = (l[6] + 3 * l[7] + 2) >> 2;
                else if (z & 1) {
                    int m = z >> 1;
                    p[y * 8 + x] = (l[m] + 2 * l[m + 1] + l[m + 2] + 2)
                                   >> 2;
                } else {
                    int m = z >> 1;
                    p[y * 8 + x] = (l[m] + l[m + 1] + 1) >> 1;
                }
            }
        break;
    }
}

// 8x8 inverse transform (§8.5.12.3; cf. h264idct_template.c
// ff_h264_idct8_add): +32 folded into the DC up front, then -- in
// spec raster layout (ff stores its block transposed) -- the ROW pass
// in place followed by the COLUMN pass with the final >>6. The
// in-pass >>1/>>2 shifts make pass order and rounding placement
// semantic, so this mirrors the reference bit-for-bit.
inline void itrans8(int* d, int* r) {
    d[0] += 32;
    for (int i = 0; i < 8; i++) {          // row pass, in place
        int* x = d + 8 * i;
        int a0 = x[0] + x[4], a2 = x[0] - x[4];
        int a4 = (x[2] >> 1) - x[6], a6 = (x[6] >> 1) + x[2];
        int b0 = a0 + a6, b2 = a2 + a4, b4 = a2 - a4, b6 = a0 - a6;
        int a1 = -x[3] + x[5] - x[7] - (x[7] >> 1);
        int a3 = x[1] + x[7] - x[3] - (x[3] >> 1);
        int a5 = -x[1] + x[7] + x[5] + (x[5] >> 1);
        int a7 = x[3] + x[5] + x[1] + (x[1] >> 1);
        int b1 = (a7 >> 2) + a1, b3 = a3 + (a5 >> 2);
        int b5 = (a3 >> 2) - a5, b7 = a7 - (a1 >> 2);
        x[0] = b0 + b7;  x[7] = b0 - b7;
        x[1] = b2 + b5;  x[6] = b2 - b5;
        x[2] = b4 + b3;  x[5] = b4 - b3;
        x[3] = b6 + b1;  x[4] = b6 - b1;
    }
    for (int i = 0; i < 8; i++) {          // column pass + >>6
        int x0 = d[i], x1 = d[i + 8], x2 = d[i + 16], x3 = d[i + 24];
        int x4 = d[i + 32], x5 = d[i + 40], x6 = d[i + 48],
            x7 = d[i + 56];
        int a0 = x0 + x4, a2 = x0 - x4;
        int a4 = (x2 >> 1) - x6, a6 = (x6 >> 1) + x2;
        int b0 = a0 + a6, b2 = a2 + a4, b4 = a2 - a4, b6 = a0 - a6;
        int a1 = -x3 + x5 - x7 - (x7 >> 1);
        int a3 = x1 + x7 - x3 - (x3 >> 1);
        int a5 = -x1 + x7 + x5 + (x5 >> 1);
        int a7 = x3 + x5 + x1 + (x1 >> 1);
        int b1 = (a7 >> 2) + a1, b3 = a3 + (a5 >> 2);
        int b5 = (a3 >> 2) - a5, b7 = a7 - (a1 >> 2);
        r[i] = (b0 + b7) >> 6;        r[i + 56] = (b0 - b7) >> 6;
        r[i + 8] = (b2 + b5) >> 6;    r[i + 48] = (b2 - b5) >> 6;
        r[i + 16] = (b4 + b3) >> 6;   r[i + 40] = (b4 - b3) >> 6;
        r[i + 24] = (b6 + b1) >> 6;   r[i + 32] = (b6 - b1) >> 6;
    }
}

// decode-order index of raster 4x4 positions within an MB (§6.4.3)
static const int ORD4[16] = {0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13,
                             10, 11, 14, 15};

// Intra_4x4 prediction for one block at 4x4-grid coords (gy,gx)
void pred4(const uint8_t* Y, int W, int w4, int gy, int gx, int mode,
           int* p, int mb_t, int mb_l, int mb_tr, int mb_tl) {
    // mb_*: neighbor-MB availability (frame edges + slice boundaries)
    int y0 = gy * 4, x0 = gx * 4;
    const int by = gy & 3, bx = gx & 3;
    int avail_t = by ? 1 : mb_t;
    int avail_l = bx ? 1 : mb_l;
    // topleft SAMPLE: the reference's 4x4 predictors read it straight
    // from frame memory whenever it exists (h264_mb.c pred4x4 call --
    // no has_topleft plumbed at 4x4, unlike 8x8), so availability is
    // frame-bounds only; conformant streams never use modes needing
    // an out-of-slice topleft
    int avail_tl = gy > 0 && gx > 0;
    (void)mb_tl;
    int cur_ord = ((gy / 4) * (w4 / 4) + gx / 4) * 16
                  + ORD4[(gy % 4) * 4 + (gx % 4)];
    int tr_ord = gy > 0 && gx + 1 < w4
        ? (((gy - 1) / 4) * (w4 / 4) + (gx + 1) / 4) * 16
          + ORD4[((gy - 1) % 4) * 4 + ((gx + 1) % 4)]
        : 0x7fffffff;
    int avail_tr = gy > 0 && gx + 1 < w4 && tr_ord < cur_ord
        && (by ? 1 : (bx == 3 ? mb_tr : mb_t));
    int t[4], l[4], tt[8], lt = 0;
    if (avail_t)
        for (int x = 0; x < 4; x++) t[x] = Y[(size_t)(y0 - 1) * W + x0 + x];
    if (avail_l)
        for (int y = 0; y < 4; y++) l[y] = Y[(size_t)(y0 + y) * W + x0 - 1];
    if (avail_tl) lt = Y[(size_t)(y0 - 1) * W + x0 - 1];
    if (avail_t) {
        for (int x = 0; x < 4; x++) tt[x] = t[x];
        for (int x = 0; x < 4; x++)
            tt[4 + x] = avail_tr ? Y[(size_t)(y0 - 1) * W + x0 + 4 + x]
                                 : t[3];
    }
    switch (mode) {
    case 0:                                 // vertical
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) p[y * 4 + x] = t[x];
        break;
    case 1:                                 // horizontal
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) p[y * 4 + x] = l[y];
        break;
    case 2: {                               // DC
        int dc;
        if (avail_t && avail_l)
            dc = (t[0] + t[1] + t[2] + t[3] + l[0] + l[1] + l[2] + l[3]
                  + 4) >> 3;
        else if (avail_t) dc = (t[0] + t[1] + t[2] + t[3] + 2) >> 2;
        else if (avail_l) dc = (l[0] + l[1] + l[2] + l[3] + 2) >> 2;
        else dc = 128;
        for (int i = 0; i < 16; i++) p[i] = dc;
        break;
    }
    case 3:                                 // diagonal down-left
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++)
                p[y * 4 + x] = (x == 3 && y == 3)
                    ? (tt[6] + 3 * tt[7] + 2) >> 2
                    : (tt[x + y] + 2 * tt[x + y + 1] + tt[x + y + 2] + 2)
                      >> 2;
        break;
    case 4:                                 // diagonal down-right
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                if (x > y) {
                    int z = x - y;
                    p[y * 4 + x] = (t[z] + 2 * t[z - 1]
                                    + (z >= 2 ? t[z - 2] : lt) + 2) >> 2;
                } else if (x < y) {
                    int z = y - x;
                    p[y * 4 + x] = (l[z] + 2 * l[z - 1]
                                    + (z >= 2 ? l[z - 2] : lt) + 2) >> 2;
                } else
                    p[y * 4 + x] = (t[0] + 2 * lt + l[0] + 2) >> 2;
            }
        break;
    case 5:                                 // vertical-right
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int z = 2 * x - y;
                if (z >= 0 && z % 2 == 0) {
                    int i = x - (y >> 1);
                    int a = i >= 1 ? t[i - 1] : lt;
                    p[y * 4 + x] = (a + t[i] + 1) >> 1;
                } else if (z >= 0) {
                    int i = x - (y >> 1);
                    int a = i >= 2 ? t[i - 2] : (i == 1 ? lt : l[0]);
                    int b = i >= 1 ? t[i - 1] : lt;
                    p[y * 4 + x] = (a + 2 * b + t[i] + 2) >> 2;
                } else if (z == -1)
                    p[y * 4 + x] = (l[0] + 2 * lt + t[0] + 2) >> 2;
                else
                    p[y * 4 + x] = (l[y - 1] + 2 * l[y - 2]
                                    + (y - 3 >= 0 ? l[y - 3] : lt) + 2) >> 2;
            }
        break;
    case 6:                                 // horizontal-down
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int z = 2 * y - x;
                if (z >= 0 && z % 2 == 0) {
                    int i = y - (x >> 1);
                    int a = i >= 1 ? l[i - 1] : lt;
                    p[y * 4 + x] = (a + l[i] + 1) >> 1;
                } else if (z >= 0) {
                    int i = y - (x >> 1);
                    int a = i >= 2 ? l[i - 2] : (i == 1 ? lt : t[0]);
                    int b = i >= 1 ? l[i - 1] : lt;
                    p[y * 4 + x] = (a + 2 * b + l[i] + 2) >> 2;
                } else if (z == -1)
                    p[y * 4 + x] = (t[0] + 2 * lt + l[0] + 2) >> 2;
                else
                    p[y * 4 + x] = (t[x - 1] + 2 * t[x - 2]
                                    + (x - 3 >= 0 ? t[x - 3] : lt) + 2) >> 2;
            }
        break;
    case 7:                                 // vertical-left
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int i = x + (y >> 1);
                p[y * 4 + x] = (y % 2 == 0)
                    ? (tt[i] + tt[i + 1] + 1) >> 1
                    : (tt[i] + 2 * tt[i + 1] + tt[i + 2] + 2) >> 2;
            }
        break;
    default:                                // 8: horizontal-up
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int z = x + 2 * y;
                if (z > 5) p[y * 4 + x] = l[3];
                else if (z == 5) p[y * 4 + x] = (l[2] + 3 * l[3] + 2) >> 2;
                else {
                    int i = y + (x >> 1);
                    p[y * 4 + x] = (z % 2 == 0)
                        ? (l[i] + l[i + 1] + 1) >> 1
                        : (l[i] + 2 * l[i + 1] + l[i + 2] + 2) >> 2;
                }
            }
        break;
    }
}

}  // namespace

// Reconstruct all intra MBs in place (raster order). resid_* hold the
// already-dequantized inverse-transformed residuals in MB-raster layout.
extern "C" void h264_intra_recon(
    uint8_t* Y, uint8_t* U, uint8_t* V, int width, int height,
    const int32_t* mb_kind, const int32_t* mb_info,
    const int8_t* i4modes,
    const int16_t* resid_y,    // [nMB][256] raster within MB
    const int16_t* resid_c,    // [nMB][2][64]
    int mb_w, int mb_h,
    const int32_t* slice_id)   // per-MB slice ids (NULL = one slice)
{
    const int cw = width / 2;
    int pred[256];
    for (int my = 0; my < mb_h; my++)
        for (int mx = 0; mx < mb_w; mx++) {
            const int mb = my * mb_w + mx;
            const int k = mb_kind[mb];
            if (k < 2 || k == 4) continue;  // inter/skip/undecoded;
                                            // I_PCM copied by caller
            // neighbor-MB availability: frame edge + same-slice (§6.4.9)
            #define SAME_SL(nmb_) (!slice_id \
                || slice_id[nmb_] == slice_id[mb])
            const int av_t = my > 0 && SAME_SL(mb - mb_w);
            const int av_l = mx > 0 && SAME_SL(mb - 1);
            const int av_tr = my > 0 && mx + 1 < mb_w
                              && SAME_SL(mb - mb_w + 1);
            const int av_tl = my > 0 && mx > 0
                              && SAME_SL(mb - mb_w - 1);
            #undef SAME_SL
            const int16_t* ry = resid_y + (size_t)mb * 256;
            if (k == K_I8X8) {              // Intra_8x8 (High profile)
                for (int b8 = 0; b8 < 4; b8++) {
                    int gy8 = my * 2 + (b8 >> 1), gx8 = mx * 2 + (b8 & 1);
                    int p8[64];
                    pred8l(Y, width, mb_w * 2, gy8, gx8,
                           i4modes[mb * 16 + b8], p8,
                           av_t, av_l, av_tr, av_tl);
                    const int oy = (b8 >> 1) * 8, ox = (b8 & 1) * 8;
                    for (int y = 0; y < 8; y++) {
                        uint8_t* row = Y + (size_t)(gy8 * 8 + y) * width
                                       + gx8 * 8;
                        for (int x = 0; x < 8; x++)
                            row[x] = clip255(
                                p8[y * 8 + x]
                                + ry[(oy + y) * 16 + ox + x]);
                    }
                }
            } else if (k == 3) {            // I_16x16
                pred16(Y, width, my, mx, mb_info[mb] & 15, pred,
                       av_t, av_l);
                for (int y = 0; y < 16; y++) {
                    uint8_t* row = Y + (size_t)(my * 16 + y) * width
                                   + mx * 16;
                    for (int x = 0; x < 16; x++)
                        row[x] = clip255(pred[y * 16 + x]
                                         + ry[y * 16 + x]);
                }
            } else {                        // I_4x4 (k == 2)
                for (int blk = 0; blk < 16; blk++) {
                    int by = BLK4[blk][0], bx = BLK4[blk][1];
                    int gy = my * 4 + by, gx = mx * 4 + bx;
                    int p4[16];
                    pred4(Y, width, mb_w * 4, gy, gx,
                          i4modes[mb * 16 + by * 4 + bx], p4,
                          av_t, av_l, av_tr, av_tl);
                    for (int y = 0; y < 4; y++) {
                        uint8_t* row = Y + (size_t)(gy * 4 + y) * width
                                       + gx * 4;
                        for (int x = 0; x < 4; x++)
                            row[x] = clip255(
                                p4[y * 4 + x]
                                + ry[(by * 4 + y) * 16 + bx * 4 + x]);
                    }
                }
            }
            const int cmode = (mb_info[mb] >> 4) & 15;
            for (int pl = 0; pl < 2; pl++) {
                uint8_t* C = pl == 0 ? U : V;
                const int16_t* rc = resid_c + ((size_t)mb * 2 + pl) * 64;
                pred8c(C, cw, my, mx, cmode, pred, av_t, av_l);
                for (int y = 0; y < 8; y++) {
                    uint8_t* row = C + (size_t)(my * 8 + y) * cw + mx * 8;
                    for (int x = 0; x < 8; x++)
                        row[x] = clip255(pred[y * 8 + x] + rc[y * 8 + x]);
                }
            }
        }
}

// ---------------------------------------------------------------------------
// Half-pel plane computation (§8.4.2.2.1): the three 6-tap FIR passes
// over a padded reference plane. Outputs are clipped pixel planes
// (uint8) aligned with the padded input; the 3-sample border ring is
// garbage by construction and is never addressed (MC clamps keep
// accesses >= 3 samples inside).
// ---------------------------------------------------------------------------

extern "C" void h264_qpel_planes(
    const uint8_t* epad, int hp, int wp,    // padded ref, padded dims
    uint8_t* bp, uint8_t* hpn, uint8_t* jp)
{
    int32_t* b1 = (int32_t*)malloc((size_t)hp * wp * sizeof(int32_t));
    memset(b1, 0, (size_t)hp * wp * sizeof(int32_t));
    // horizontal 6-tap between x and x+1 (unscaled intermediates)
    for (int y = 0; y < hp; y++) {
        const uint8_t* r = epad + (size_t)y * wp;
        int32_t* o = b1 + (size_t)y * wp;
        for (int x = 2; x < wp - 3; x++)
            o[x] = r[x - 2] - 5 * r[x - 1] + 20 * r[x] + 20 * r[x + 1]
                   - 5 * r[x + 2] + r[x + 3];
    }
    for (int y = 0; y < hp; y++) {
        const int32_t* o = b1 + (size_t)y * wp;
        uint8_t* d = bp + (size_t)y * wp;
        for (int x = 0; x < wp; x++) {
            int v = (o[x] + 16) >> 5;
            d[x] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
        }
    }
    // vertical 6-tap between y and y+1
    for (int y = 2; y < hp - 3; y++) {
        const uint8_t* rm2 = epad + (size_t)(y - 2) * wp;
        const uint8_t* rm1 = epad + (size_t)(y - 1) * wp;
        const uint8_t* r0 = epad + (size_t)y * wp;
        const uint8_t* r1 = epad + (size_t)(y + 1) * wp;
        const uint8_t* r2 = epad + (size_t)(y + 2) * wp;
        const uint8_t* r3 = epad + (size_t)(y + 3) * wp;
        uint8_t* d = hpn + (size_t)y * wp;
        for (int x = 0; x < wp; x++) {
            int v = rm2[x] - 5 * rm1[x] + 20 * r0[x] + 20 * r1[x]
                    - 5 * r2[x] + r3[x];
            v = (v + 16) >> 5;
            d[x] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
        }
    }
    // center: vertical 6-tap over the horizontal intermediates
    for (int y = 2; y < hp - 3; y++) {
        const int32_t* rm2 = b1 + (size_t)(y - 2) * wp;
        const int32_t* rm1 = b1 + (size_t)(y - 1) * wp;
        const int32_t* r0 = b1 + (size_t)y * wp;
        const int32_t* r1 = b1 + (size_t)(y + 1) * wp;
        const int32_t* r2 = b1 + (size_t)(y + 2) * wp;
        const int32_t* r3 = b1 + (size_t)(y + 3) * wp;
        uint8_t* d = jp + (size_t)y * wp;
        for (int x = 0; x < wp; x++) {
            int v = rm2[x] - 5 * rm1[x] + 20 * r0[x] + 20 * r1[x]
                    - 5 * r2[x] + r3[x];
            v = (v + 512) >> 10;
            d[x] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
        }
    }
    free(b1);
}

// ---------------------------------------------------------------------------
// Full-frame reconstruction: dequant + inverse transform + inter MC +
// intra assembly, from the per-MB entropy tensors. Spec §8.4.2.2
// (fractional MC), §8.5 (transforms). This is the host fast path of
// codecs/h264/recon.py (bit-identical; asserted in tests) — used on the
// latency-bound decode side where per-frame device round-trips over the
// TPU tunnel would dominate; the batched device path remains for
// throughput workloads.
// ---------------------------------------------------------------------------

namespace {

// dequant V table (§8.5.9) by qp%6 and position class (0:corner-even,
// 1:odd-odd, 2:mixed)
static const int VTAB[6][3] = {{10, 16, 13}, {11, 18, 14}, {13, 20, 16},
                               {14, 23, 18}, {16, 25, 20}, {18, 29, 23}};
static const int POSCLS[16] = {0, 2, 0, 2, 2, 1, 2, 1,
                               0, 2, 0, 2, 2, 1, 2, 1};
static const int ZZ4[16] = {0, 1, 4, 8, 5, 2, 3, 6,
                            9, 12, 13, 10, 7, 11, 14, 15};
static const int CHROMA_QP_TAB[52] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 29, 30, 31, 32, 32, 33,
    34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39};

// inverse 4x4 core transform (§8.5.12.2) on raster d[16] -> r[16]
inline void itrans4(const int* d, int* r) {
    int h[16];
    for (int i = 0; i < 4; i++) {
        const int* x = d + 4 * i;
        int e0 = x[0] + x[2], e1 = x[0] - x[2];
        int e2 = (x[1] >> 1) - x[3], e3 = x[1] + (x[3] >> 1);
        h[4 * i + 0] = e0 + e3;
        h[4 * i + 1] = e1 + e2;
        h[4 * i + 2] = e1 - e2;
        h[4 * i + 3] = e0 - e3;
    }
    for (int j = 0; j < 4; j++) {
        int e0 = h[j] + h[8 + j], e1 = h[j] - h[8 + j];
        int e2 = (h[4 + j] >> 1) - h[12 + j];
        int e3 = h[4 + j] + (h[12 + j] >> 1);
        r[j] = (e0 + e3 + 32) >> 6;
        r[4 + j] = (e1 + e2 + 32) >> 6;
        r[8 + j] = (e1 - e2 + 32) >> 6;
        r[12 + j] = (e0 - e3 + 32) >> 6;
    }
}

// dezigzag + AC dequant one 4x4 block (levels in zigzag order)
inline void deq4(const int16_t* zz, int qp, int* out, int skip_dc) {
    const int* V = VTAB[qp % 6];
    const int sh = qp / 6;
    for (int i = 0; i < 16; i++) out[i] = 0;
    for (int i = skip_dc; i < 16; i++) {
        int pos = ZZ4[i];
        out[pos] = ((int)zz[i] * V[POSCLS[pos]]) << sh;
    }
}

// qpel plane-pair selection (recon.py _QPEL_MAP): for (fx, fy) gives
// plane indices 0=E 1=b 2=h 3=j and the (dy,dx) offset of the second tap
struct QM { int8_t p1, d1y, d1x, p2, d2y, d2x; };
static const QM QMAP[4][4] = {
    // [fx][fy]
    {{0,0,0, 0,0,0}, {0,0,0, 2,0,0}, {2,0,0, 2,0,0}, {2,0,0, 0,1,0}},
    {{0,0,0, 1,0,0}, {1,0,0, 2,0,0}, {2,0,0, 3,0,0}, {2,0,0, 1,1,0}},
    {{1,0,0, 1,0,0}, {1,0,0, 3,0,0}, {3,0,0, 3,0,0}, {3,0,0, 1,1,0}},
    {{1,0,0, 0,0,1}, {1,0,0, 2,0,1}, {3,0,0, 2,0,1}, {2,0,1, 1,1,0}},
};

}  // namespace

// Reconstruct one frame in place. Planes Y/U/V are outputs (fully
// overwritten for decoded MBs). Reference planes come as per-ref
// pointer arrays: refE/B/H/J point at [hp][wp] padded luma planes
// (PAD=32), refU/refV at [hc][wc] padded chroma (PADC=16) — built once
// per DPB entry and reused across frames. Returns 0, or -1 on
// out-of-range ref idx.
extern "C" int h264_recon_frame(
    uint8_t* Y, uint8_t* U, uint8_t* V,
    int mb_w, int mb_h, int chroma_qp_off,
    const int32_t* kind, const int32_t* info, const int8_t* i4modes,
    const int16_t* mv,          // [nMB][16][2] (x, y) qpel
    const int8_t* ref,          // [nMB][4]
    const int32_t* qp,          // [nMB]
    const int16_t* coeffs,     // [nMB][27][16] zigzag levels
    int n_ref, int hp, int wp, int hc, int wc,
    const uint8_t* const* refE, const uint8_t* const* refB,
    const uint8_t* const* refH, const uint8_t* const* refJ,
    const uint8_t* const* refU, const uint8_t* const* refV,
    // list 1 (B slices): null mv1 = P slice
    const int16_t* mv1, const int8_t* ref1, int n_ref1,
    const uint8_t* const* r1E, const uint8_t* const* r1B,
    const uint8_t* const* r1H, const uint8_t* const* r1J,
    const uint8_t* const* r1U, const uint8_t* const* r1V,
    // High profile (all optional):
    const int32_t* qmul4,    // [6][52][16] raster dequant, NULL = flat
    const int32_t* qmul8,    // [2][52][64] raster dequant, NULL = flat
    int cqp_off2,            // Cr-plane qp offset (2nd PPS offset)
    // weighted prediction, per SLICE (ref idx are frame-global after
    // the codec's per-slice list remap):
    const int32_t* wmode,    // [nslices] 0 none / 1 explicit / 2 impl
    const int32_t* wld,      // [nslices][2] luma/chroma log2 denoms
    const int32_t* wpx,      // [nslices][2][32][6] explicit weights
    const int16_t* impw,     // implicit bi weights [r0*32+r1][2] / NULL
    const int32_t* slice_id) // per-MB slice ids or NULL
{
    const int W = mb_w * 16, H = mb_h * 16;
    const int cw = W / 2;
    const int nmb = mb_w * mb_h;
    const int PADL = 32, PADC2 = 16;
    int16_t* resid_y = (int16_t*)malloc((size_t)nmb * 256 * 2);
    int16_t* resid_c = (int16_t*)malloc((size_t)nmb * 128 * 2);
    // per-MB nonzero-residual masks: bit b of lmask = luma 4x4 block b
    // (raster) has residual; cmask bits 0-3 = U 4x4s, 4-7 = V 4x4s
    uint16_t* lmask = (uint16_t*)calloc(nmb, 2);
    uint8_t* cmask = (uint8_t*)calloc(nmb, 1);
    int have_intra = 0;

    // ---- residuals for every decoded MB (empty blocks skipped) ----
    for (int mb = 0; mb < nmb; mb++) {
        const int k = kind[mb];
        int16_t* ry = resid_y + (size_t)mb * 256;
        int16_t* rc = resid_c + (size_t)mb * 128;
        if (k < 0) { continue; }
        const int intra = k >= 2;
        if (intra) have_intra = 1;
        const int mqp = qp[mb];
        const int cqpP[2] = {
            CHROMA_QP_TAB[iclip(mqp + chroma_qp_off, 0, 51)],
            CHROMA_QP_TAB[iclip(mqp + cqp_off2, 0, 51)]};
        const int cqp = cqpP[0];
        const int16_t* cf = coeffs + (size_t)mb * 27 * 16;
        const int t8 = (info[mb] & INFO_T8) != 0;
        if (t8) {
            // 8x8 transform luma: rows 1+4g..4+4g hold the group's 64
            // zigzag levels; dequant (8.5.9 + scaling list, rounding
            // per (lev*qmul+32)>>6) then the 8x8 inverse transform
            const int mi8 = intra ? 0 : 1;
            const int32_t* qm8 = qmul8
                ? qmul8 + ((size_t)mi8 * 52 + mqp) * 64 : 0;
            for (int g = 0; g < 4; g++) {
                const int16_t* lev = cf + (size_t)(1 + 4 * g) * 16;
                int any = 0;
                for (int i = 0; i < 64 && !any; i++) any |= lev[i] != 0;
                const int gy0 = (g >> 1) * 8, gx0 = (g & 1) * 8;
                if (!any) {
                    for (int y = 0; y < 8; y++)
                        memset(ry + (gy0 + y) * 16 + gx0, 0, 16);
                    continue;
                }
                lmask[mb] |= (uint16_t)(0x33u << ((g >> 1) * 8
                                                  + (g & 1) * 2));
                int d[64], r[64];
                for (int i = 0; i < 64; i++) d[i] = 0;
                for (int i = 0; i < 64; i++) {
                    if (!lev[i]) continue;
                    const int pos = ZZ8[i];
                    const int q = qm8 ? qm8[pos]
                        : (D8INIT[mqp % 6][D8CLS[4 * ((pos >> 3) & 3)
                                                 + (pos & 3)]] * 16)
                          << (mqp / 6);
                    d[pos] = ((int)lev[i] * q + 32) >> 6;
                }
                itrans8(d, r);
                for (int y = 0; y < 8; y++)
                    for (int x = 0; x < 8; x++)
                        ry[(gy0 + y) * 16 + gx0 + x] =
                            (int16_t)r[y * 8 + x];
            }
            goto chroma_residual;
        }
        // luma: 16 blocks in raster (by,bx) order at rows 1..17
        int dcd[16];
        int have_ldc;        // (assigned, not initialized: the t8
        have_ldc = 0;        //  path goto-skips this section)
        if (k == 3) {               // I_16x16: hadamard + DC dequant
            int d[16] = {0}, f[16];
            for (int i = 0; i < 16; i++) d[ZZ4[i]] = cf[i];
            // f = H4 d H4 with H4 rows {1,1,1,1},{1,1,-1,-1},{1,-1,-1,1},{1,-1,1,-1}
            static const int H4[4][4] = {{1, 1, 1, 1}, {1, 1, -1, -1},
                                         {1, -1, -1, 1}, {1, -1, 1, -1}};
            int t[16];
            for (int i = 0; i < 4; i++)
                for (int j = 0; j < 4; j++) {
                    int s = 0;
                    for (int kk = 0; kk < 4; kk++)
                        s += H4[i][kk] * d[4 * kk + j];
                    t[4 * i + j] = s;
                }
            for (int i = 0; i < 4; i++)
                for (int j = 0; j < 4; j++) {
                    int s = 0;
                    for (int kk = 0; kk < 4; kk++)
                        s += t[4 * i + kk] * H4[j][kk];
                    f[4 * i + j] = s;
                }
            if (qmul4) {
                // (dc * qmul[0] + 128) >> 8 (h264idct_template.c:
                // luma_dc_dequant_idct scaling; includes the weight)
                const long long q0 = qmul4[(size_t)mqp * 16];
                for (int i = 0; i < 16; i++) {
                    dcd[i] = (int)(((long long)f[i] * q0 + 128) >> 8);
                    have_ldc |= dcd[i] != 0;
                }
            } else {
                const int v0 = VTAB[mqp % 6][0];
                for (int i = 0; i < 16; i++) {
                    long long fv = (long long)f[i] * v0;
                    if (mqp >= 12) dcd[i] = (int)(fv << (mqp / 6 - 2));
                    else dcd[i] = (int)((fv + (1ll << (1 - mqp / 6)))
                                        >> (2 - mqp / 6));
                    have_ldc |= dcd[i] != 0;
                }
            }
        }
        for (int blk = 0; blk < 16; blk++) {
            const int16_t* row = cf + 16 * (1 + blk);
            int any = (k == 3) ? (dcd[blk] != 0) : 0;
            for (int i = (k == 3) ? 1 : 0; i < 16 && !any; i++)
                any |= row[i] != 0;
            const int by = blk / 4, bx = blk % 4;
            int16_t* dst = ry + (by * 4) * 16 + bx * 4;
            if (!any) {
                for (int y = 0; y < 4; y++)
                    memset(dst + y * 16, 0, 8);
                continue;
            }
            lmask[mb] |= (uint16_t)(1u << blk);
            int d[16], r[16];
            if (qmul4) {
                const int32_t* qm = qmul4
                    + ((size_t)(intra ? 0 : 3) * 52 + mqp) * 16;
                for (int i = 0; i < 16; i++) d[i] = 0;
                for (int i = (k == 3 ? 1 : 0); i < 16; i++) {
                    int pos = ZZ4[i];
                    d[pos] = ((int)row[i] * qm[pos] + 32) >> 6;
                }
            } else {
                deq4(row, mqp, d, k == 3 ? 1 : 0);
            }
            if (k == 3) d[0] = dcd[(blk / 4) * 4 + (blk % 4)];
            itrans4(d, r);
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++)
                    dst[y * 16 + x] = (int16_t)r[4 * y + x];
        }
chroma_residual:;
        // chroma: DC rows 17,18 (first 4 coeffs, 2x2 raster); AC 19..27
        for (int pl = 0; pl < 2; pl++) {
            const int pqp = cqpP[pl];
            int cdc[4];
            const int16_t* cdcz = cf + 16 * (17 + pl);
            // f = H2 dc H2
            int a = cdcz[0], b = cdcz[1], c = cdcz[2], dd = cdcz[3];
            int f0 = a + b + c + dd, f1 = a - b + c - dd;
            int f2 = a + b - c - dd, f3 = a - b - c + dd;
            const int cmi = (intra ? 1 : 4) + pl;   // Cb/Cr matrix idx
            if (qmul4) {
                // (f * qmul[0]) >> 7 (chroma_dc_dequant_idct scaling)
                const long long q0 =
                    qmul4[((size_t)cmi * 52 + pqp) * 16];
                cdc[0] = (int)(((long long)f0 * q0) >> 7);
                cdc[1] = (int)(((long long)f1 * q0) >> 7);
                cdc[2] = (int)(((long long)f2 * q0) >> 7);
                cdc[3] = (int)(((long long)f3 * q0) >> 7);
            } else {
                const int v0 = VTAB[pqp % 6][0];
                cdc[0] = ((f0 * v0) << (pqp / 6)) >> 1;
                cdc[1] = ((f1 * v0) << (pqp / 6)) >> 1;
                cdc[2] = ((f2 * v0) << (pqp / 6)) >> 1;
                cdc[3] = ((f3 * v0) << (pqp / 6)) >> 1;
            }
            for (int blk = 0; blk < 4; blk++) {
                const int16_t* row = cf + 16 * (19 + pl * 4 + blk);
                int any = cdc[blk] != 0;
                for (int i = 1; i < 16 && !any; i++) any |= row[i] != 0;
                const int by = blk / 2, bx = blk % 2;
                int16_t* dst = rc + pl * 64 + (by * 4) * 8 + bx * 4;
                if (!any) {
                    for (int y = 0; y < 4; y++)
                        memset(dst + y * 8, 0, 8);
                    continue;
                }
                cmask[mb] |= (uint8_t)(1u << (pl * 4 + blk));
                int d[16], r[16];
                if (qmul4) {
                    const int32_t* qm =
                        qmul4 + ((size_t)cmi * 52 + pqp) * 16;
                    for (int i = 0; i < 16; i++) d[i] = 0;
                    for (int i = 1; i < 16; i++) {
                        int pos = ZZ4[i];
                        d[pos] = ((int)row[i] * qm[pos] + 32) >> 6;
                    }
                } else {
                    deq4(row, pqp, d, 1);
                }
                d[0] = cdc[blk];
                itrans4(d, r);
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++)
                        dst[y * 8 + x] = (int16_t)r[4 * y + x];
            }
        }
    }

    // ---- inter MBs: qpel MC + residual ----
    for (int my = 0; my < mb_h; my++)
    for (int mx = 0; mx < mb_w; mx++) {
        const int mb = my * mb_w + mx;
        const int k = kind[mb];
        if (k != 0 && k != 1) continue;
        if (mv1 && ref1 && ref1[mb * 4] >= 0)
            continue;               // L1-involved: bi-pred pass below
        const int16_t* ry = resid_y + (size_t)mb * 256;
        const int16_t* rc = resid_c + (size_t)mb * 128;
        const int16_t* mvp = mv + (size_t)mb * 32;
        // uniform fast path: one MV + one ref for the whole MB (16x16
        // partitions and P_SKIP -- the dominant case)
        int uniform = 1;
        for (int b = 1; b < 16 && uniform; b++)
            uniform = mvp[2 * b] == mvp[0] && mvp[2 * b + 1] == mvp[1];
        if (uniform)
            uniform = ref[mb * 4] == ref[mb * 4 + 1]
                   && ref[mb * 4] == ref[mb * 4 + 2]
                   && ref[mb * 4] == ref[mb * 4 + 3];
        const int nb = uniform ? 1 : 16;
        for (int blk = 0; blk < nb; blk++) {
            const int by = blk / 4, bx = blk % 4;
            const int bs = uniform ? 16 : 4;     // block size
            const int y0 = my * 16 + by * 4, x0 = mx * 16 + bx * 4;
            const int mvx = mvp[blk * 2];
            const int mvy = mvp[blk * 2 + 1];
            const int r8 = ref[mb * 4 + (by / 2) * 2 + bx / 2];
            if (r8 < 0 || r8 >= n_ref) { free(resid_y); free(resid_c);
                                         free(lmask); free(cmask);
                                         return -1; }
            const uint8_t* planes[4] = {refE[r8], refB[r8], refH[r8],
                                        refJ[r8]};
            const int fx = mvx & 3, fy = mvy & 3;
            const QM& q = QMAP[fx][fy];
            int iy = iclip(y0 + (mvy >> 2) + PADL, 3, hp - bs - 4);
            int ix = iclip(x0 + (mvx >> 2) + PADL, 3, wp - bs - 4);
            const uint8_t* p1 = planes[q.p1]
                + (size_t)(iy + q.d1y) * wp + ix + q.d1x;
            const uint8_t* p2 = planes[q.p2]
                + (size_t)(iy + q.d2y) * wp + ix + q.d2x;
            const uint16_t lm = lmask[mb];
            // explicit weights (§8.4.2.3.2, single direction): the
            // interpolated sample is weighted+clipped BEFORE the
            // residual add (two clips, like the reference pipeline)
            const int sid = slice_id ? slice_id[mb] : 0;
            const int expw = wmode && wmode[sid] == 1;
            const int luma_ld = expw ? wld[sid * 2] : 0;
            const int chroma_ld = expw ? wld[sid * 2 + 1] : 0;
            const int32_t* wps = expw
                ? wpx + (size_t)sid * 2 * 32 * 6 : 0;
            const int wl = wps ? wps[(size_t)r8 * 6 + 0] : 1;
            const int olw = wps ? wps[(size_t)r8 * 6 + 1] : 0;
            for (int y = 0; y < bs; y++) {
                uint8_t* orow = Y + (size_t)(y0 + y) * W + x0;
                const uint8_t* a = p1 + (size_t)y * wp;
                const uint8_t* b = p2 + (size_t)y * wp;
                // residual row mask for this pixel row (uniform: 4 blocks)
                const int rby = by + (uniform ? y / 4 : 0);
                const int16_t* rr = ry + ((uniform ? y : by * 4 + y) * 16)
                                    + bx * 4;
                const int skip_r = uniform
                    ? !((lm >> (rby * 4)) & 0xF)      // whole row-of-blocks
                    : !((lm >> blk) & 1);
                if (!wps) {
                    if (skip_r) {
                        for (int x = 0; x < bs; x++)
                            orow[x] = (uint8_t)((a[x] + b[x] + 1) >> 1);
                    } else {
                        for (int x = 0; x < bs; x++)
                            orow[x] = clip255(((a[x] + b[x] + 1) >> 1)
                                              + rr[x]);
                    }
                } else {
                    for (int x = 0; x < bs; x++) {
                        int p = (a[x] + b[x] + 1) >> 1;
                        p = luma_ld > 0
                            ? ((p * wl + (1 << (luma_ld - 1)))
                               >> luma_ld) + olw
                            : p * wl + olw;
                        int pc = (int)clip255(p);
                        orow[x] = skip_r ? (uint8_t)pc
                                         : clip255(pc + rr[x]);
                    }
                }
            }
            // chroma (eighth-pel bilinear): 8x8 in uniform mode, 2x2 else
            const int cs = bs / 2;
            const int cy0 = y0 / 2, cx0 = x0 / 2;
            const int dx = mvx & 7, dy = mvy & 7;
            int ciy = iclip(cy0 + (mvy >> 3) + PADC2, 0, hc - cs - 2);
            int cix = iclip(cx0 + (mvx >> 3) + PADC2, 0, wc - cs - 2);
            const int w00 = (8 - dx) * (8 - dy), w01 = dx * (8 - dy);
            const int w10 = (8 - dx) * dy, w11 = dx * dy;
            for (int pl = 0; pl < 2; pl++) {
                const uint8_t* C = (pl ? refV : refU)[r8];
                uint8_t* O = pl ? V : U;
                const int16_t* rcb = rc + pl * 64;
                const int any_c = (cmask[mb] >> (pl * 4)) & 0xF;
                const int wcq = wps ? wps[(size_t)r8 * 6 + 2 + pl * 2]
                                    : 1;
                const int ocq = wps ? wps[(size_t)r8 * 6 + 3 + pl * 2]
                                    : 0;
                for (int y = 0; y < cs; y++) {
                    const uint8_t* r0 = C + (size_t)(ciy + y) * wc + cix;
                    const uint8_t* r1 = r0 + wc;
                    uint8_t* orow = O + (size_t)(cy0 + y) * cw + cx0;
                    const int ry_off = cy0 - my * 8 + y;
                    for (int x = 0; x < cs; x++) {
                        int p = (w00 * r0[x] + w01 * r0[x + 1]
                                 + w10 * r1[x] + w11 * r1[x + 1] + 32)
                                >> 6;
                        if (wps) {
                            p = chroma_ld > 0
                                ? ((p * wcq + (1 << (chroma_ld - 1)))
                                   >> chroma_ld) + ocq
                                : p * wcq + ocq;
                            p = (int)clip255(p);
                        }
                        orow[x] = any_c
                            ? clip255(p + rcb[ry_off * 8
                                              + (cx0 - mx * 8 + x)])
                            : (uint8_t)p;
                    }
                }
            }
        }
    }

    // ---- B MBs using list 1 (single-direction L1 or bi-pred avg) ----
    if (mv1 && ref1)
    for (int my = 0; my < mb_h; my++)
    for (int mx = 0; mx < mb_w; mx++) {
        const int mb = my * mb_w + mx;
        const int k = kind[mb];
        if (k != 0 && k != 1) continue;
        if (ref1[mb * 4] < 0) continue;
        const int l0 = ref[mb * 4] >= 0;
        const int16_t* ry = resid_y + (size_t)mb * 256;
        const int16_t* rc = resid_c + (size_t)mb * 128;
        for (int blk = 0; blk < 16; blk++) {
            const int by = blk / 4, bx = blk % 4;
            const int y0 = my * 16 + by * 4, x0 = mx * 16 + bx * 4;
            int py[2][16], pu[2][4], pv[2][4];
            int nlists = 0;
            int rsel[2] = {0, 0}, lsel[2] = {0, 0};
            for (int list = 0; list < 2; list++) {
                if (list == 0 && !l0) continue;
                const int16_t* M = list ? mv1 : mv;
                const int8_t* R = list ? ref1 : ref;
                const int NR = list ? n_ref1 : n_ref;
                const uint8_t* const* pE = list ? r1E : refE;
                const uint8_t* const* pB = list ? r1B : refB;
                const uint8_t* const* pH = list ? r1H : refH;
                const uint8_t* const* pJ = list ? r1J : refJ;
                const uint8_t* const* pU = list ? r1U : refU;
                const uint8_t* const* pV = list ? r1V : refV;
                const int mvx = M[((size_t)mb * 16 + blk) * 2];
                const int mvy = M[((size_t)mb * 16 + blk) * 2 + 1];
                const int r8 = R[mb * 4 + (by / 2) * 2 + bx / 2];
                if (r8 < 0 || r8 >= NR) {
                    free(resid_y); free(resid_c);
                    free(lmask); free(cmask);
                    return -1;
                }
                const uint8_t* planes[4] = {pE[r8], pB[r8], pH[r8],
                                            pJ[r8]};
                const int fx = mvx & 3, fy = mvy & 3;
                const QM& q = QMAP[fx][fy];
                int iy = iclip(y0 + (mvy >> 2) + PADL, 3, hp - 8);
                int ix = iclip(x0 + (mvx >> 2) + PADL, 3, wp - 8);
                const uint8_t* p1 = planes[q.p1]
                    + (size_t)(iy + q.d1y) * wp + ix + q.d1x;
                const uint8_t* p2 = planes[q.p2]
                    + (size_t)(iy + q.d2y) * wp + ix + q.d2x;
                int* dst = py[nlists];
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++)
                        dst[y * 4 + x] =
                            (p1[(size_t)y * wp + x]
                             + p2[(size_t)y * wp + x] + 1) >> 1;
                // chroma 2x2
                const int cy0 = y0 / 2, cx0 = x0 / 2;
                const int dx = mvx & 7, dy = mvy & 7;
                int ciy = iclip(cy0 + (mvy >> 3) + PADC2, 0, hc - 4);
                int cix = iclip(cx0 + (mvx >> 3) + PADC2, 0, wc - 4);
                for (int pl = 0; pl < 2; pl++) {
                    const uint8_t* C = (pl ? pV : pU)[r8];
                    int* cd = pl ? pv[nlists] : pu[nlists];
                    for (int y = 0; y < 2; y++) {
                        const uint8_t* r0 =
                            C + (size_t)(ciy + y) * wc + cix;
                        const uint8_t* r1r = r0 + wc;
                        for (int x = 0; x < 2; x++)
                            cd[y * 2 + x] =
                                ((8 - dx) * (8 - dy) * r0[x]
                                 + dx * (8 - dy) * r0[x + 1]
                                 + (8 - dx) * dy * r1r[x]
                                 + dx * dy * r1r[x + 1] + 32) >> 6;
                    }
                }
                rsel[nlists] = r8;
                lsel[nlists] = list;
                nlists++;
            }
            // weighted combination (§8.4.2.3.2): explicit per-list
            // weights, or implicit bi-prediction weights from the POC
            // distance table (single direction stays unweighted there)
            const int sid = slice_id ? slice_id[mb] : 0;
            const int smode = wmode ? wmode[sid] : 0;
            const int luma_ld = smode == 1 ? wld[sid * 2] : 5;
            const int chroma_ld = smode == 1 ? wld[sid * 2 + 1] : 5;
            const int32_t* wps = smode == 1
                ? wpx + (size_t)sid * 2 * 32 * 6 : 0;
            const int16_t* imps = smode == 2 ? impw : 0;
            int wy0 = 1, wy1 = 0, oy2 = 0, bi_w = 0;
            int wc0[2] = {1, 1}, wc1[2] = {0, 0}, oc2[2] = {0, 0};
            if (nlists == 2 && imps) {
                const int16_t* iw = imps + ((size_t)rsel[0] * 32
                                            + rsel[1]) * 2;
                wy0 = iw[0]; wy1 = iw[1]; oy2 = 0; bi_w = 1;
                wc0[0] = wc0[1] = iw[0];
                wc1[0] = wc1[1] = iw[1];
            } else if (wps) {
                const int32_t* wA =
                    wps + ((size_t)lsel[0] * 32 + rsel[0]) * 6;
                if (nlists == 2) {
                    const int32_t* wB =
                        wps + ((size_t)lsel[1] * 32 + rsel[1]) * 6;
                    wy0 = wA[0]; wy1 = wB[0];
                    oy2 = (wA[1] + wB[1] + 1) >> 1;
                    for (int pl = 0; pl < 2; pl++) {
                        wc0[pl] = wA[2 + pl * 2];
                        wc1[pl] = wB[2 + pl * 2];
                        oc2[pl] = (wA[3 + pl * 2] + wB[3 + pl * 2] + 1)
                                  >> 1;
                    }
                    bi_w = 1;
                } else {
                    wy0 = wA[0]; oy2 = wA[1]; bi_w = 2;
                    for (int pl = 0; pl < 2; pl++) {
                        wc0[pl] = wA[2 + pl * 2];
                        oc2[pl] = wA[3 + pl * 2];
                    }
                }
            }
            const int ild = luma_ld;
            const int icd = chroma_ld;
            for (int y = 0; y < 4; y++) {
                uint8_t* orow = Y + (size_t)(y0 + y) * W + x0;
                const int16_t* rr = ry + (by * 4 + y) * 16 + bx * 4;
                for (int x = 0; x < 4; x++) {
                    int p;
                    if (nlists == 2) {
                        if (bi_w == 1)
                            p = (int)clip255(
                                ((py[0][y * 4 + x] * wy0
                                  + py[1][y * 4 + x] * wy1
                                  + (1 << ild)) >> (ild + 1)) + oy2);
                        else
                            p = (py[0][y * 4 + x] + py[1][y * 4 + x]
                                 + 1) >> 1;
                    } else if (bi_w == 2) {
                        p = py[0][y * 4 + x];
                        p = ild > 0
                            ? ((p * wy0 + (1 << (ild - 1))) >> ild) + oy2
                            : p * wy0 + oy2;
                        p = (int)clip255(p);
                    } else {
                        p = py[0][y * 4 + x];
                    }
                    orow[x] = clip255(p + rr[x]);
                }
            }
            const int cy0 = y0 / 2, cx0 = x0 / 2;
            for (int pl = 0; pl < 2; pl++) {
                uint8_t* O = pl ? V : U;
                const int16_t* rcb = rc + pl * 64;
                for (int y = 0; y < 2; y++) {
                    uint8_t* orow = O + (size_t)(cy0 + y) * cw + cx0;
                    for (int x = 0; x < 2; x++) {
                        int* a = pl ? pv[0] : pu[0];
                        int* bb2 = pl ? pv[1] : pu[1];
                        int p;
                        if (nlists == 2) {
                            if (bi_w == 1)
                                p = (int)clip255(
                                    ((a[y * 2 + x] * wc0[pl]
                                      + bb2[y * 2 + x] * wc1[pl]
                                      + (1 << icd)) >> (icd + 1))
                                    + oc2[pl]);
                            else
                                p = (a[y * 2 + x] + bb2[y * 2 + x] + 1)
                                    >> 1;
                        } else if (bi_w == 2) {
                            p = a[y * 2 + x];
                            p = icd > 0
                                ? ((p * wc0[pl] + (1 << (icd - 1)))
                                   >> icd) + oc2[pl]
                                : p * wc0[pl] + oc2[pl];
                            p = (int)clip255(p);
                        } else {
                            p = a[y * 2 + x];
                        }
                        orow[x] = clip255(
                            p + rcb[(cy0 - my * 8 + y) * 8
                                    + (cx0 - mx * 8 + x)]);
                    }
                }
            }
        }
    }

    // ---- intra MBs (raster order, §8.3 dependency order) ----
    // I_PCM samples must land BEFORE the intra pass: intra MBs below/
    // right of a PCM MB predict from its reconstructed pixels (§8.3)
    for (int mb = 0; mb < nmb; mb++) {
        if (kind[mb] != 4) continue;
        const int my = mb / mb_w, mx = mb % mb_w;
        const int16_t* cf = coeffs + (size_t)mb * 27 * 16;
        for (int yy = 0; yy < 16; yy++)
            for (int xx = 0; xx < 16; xx++)
                Y[(size_t)(my * 16 + yy) * W + mx * 16 + xx] =
                    (uint8_t)cf[yy * 16 + xx];
        for (int yy = 0; yy < 8; yy++)
            for (int xx = 0; xx < 8; xx++) {
                U[(size_t)(my * 8 + yy) * (W / 2) + mx * 8 + xx] =
                    (uint8_t)cf[256 + yy * 8 + xx];
                V[(size_t)(my * 8 + yy) * (W / 2) + mx * 8 + xx] =
                    (uint8_t)cf[320 + yy * 8 + xx];
            }
    }
    if (have_intra)
        h264_intra_recon(Y, U, V, W, H, kind, info, i4modes,
                         resid_y, resid_c, mb_w, mb_h, slice_id);
    free(resid_y);
    free(resid_c);
    free(lmask);
    free(cmask);
    return 0;
}

// ---------------------------------------------------------------------------
// CABAC entropy layer (§9.3): arithmetic decoder + encoder engines and
// the H.264 slice-data syntax in CABAC form, emitting/consuming the
// same per-MB tensor layout as the CAVLC path above.
//
// Engine follows the spec state machine (Tables 9-44/9-45 in
// cabac_tables.h, extracted spec constants); context derivation per
// §9.3.3.1 (behavioral reference h264_cabac.c — neighbor cache
// semantics, not a translation). The encoder is the exact inverse,
// enabling CAVLC->CABAC entropy transcoding validated against the
// reference decoder in tests.
// ---------------------------------------------------------------------------

#include "cabac_tables.h"

namespace {

struct CabDec {
    const uint8_t* data;
    int nbits, pos;
    uint32_t range, offset;
    uint8_t state[1024];   // 6-bit state | mps in bit 6? -> split arrays
    uint8_t mps[1024];
    int error;
};

inline int cd_bit(CabDec* c) {
    if (c->pos >= c->nbits) { c->error = 1; return 0; }
    int v = (c->data[c->pos >> 3] >> (7 - (c->pos & 7))) & 1;
    c->pos++;
    return v;
}

void cab_init_contexts(uint8_t* st, uint8_t* mps, int qp,
                       const int8_t (*tab)[2]) {
    for (int i = 0; i < 1024; i++) {
        int pre = ((tab[i][0] * (qp < 0 ? 0 : (qp > 51 ? 51 : qp))) >> 4)
                  + tab[i][1];
        if (pre < 1) pre = 1;
        if (pre > 126) pre = 126;
        if (pre >= 64) { st[i] = (uint8_t)(pre - 64); mps[i] = 1; }
        else { st[i] = (uint8_t)(63 - pre); mps[i] = 0; }
    }
}

void cd_start(CabDec* c, const uint8_t* data, int nbits, int pos) {
    c->data = data; c->nbits = nbits; c->error = 0;
    c->pos = (pos + 7) & ~7;      // cabac_alignment_one_bit(s)
    c->range = 510;
    c->offset = 0;
    for (int i = 0; i < 9; i++) c->offset = (c->offset << 1) | cd_bit(c);
}

inline int cd_decision(CabDec* c, int ctx) {
    uint32_t lps = CAB_LPS[c->state[ctx]][(c->range >> 6) & 3];
    c->range -= lps;
    int bin;
    if (c->offset >= c->range) {
        bin = !c->mps[ctx];
        c->offset -= c->range;
        c->range = lps;
        if (c->state[ctx] == 0) c->mps[ctx] = !c->mps[ctx];
        c->state[ctx] = CAB_TRANS_LPS[c->state[ctx]];
    } else {
        bin = c->mps[ctx];
        if (c->state[ctx] < 62) c->state[ctx]++;
    }
    while (c->range < 256) {
        c->range <<= 1;
        c->offset = (c->offset << 1) | cd_bit(c);
    }
    return bin;
}

inline int cd_bypass(CabDec* c) {
    c->offset = (c->offset << 1) | cd_bit(c);
    if (c->offset >= c->range) { c->offset -= c->range; return 1; }
    return 0;
}

inline int cd_terminate(CabDec* c) {
    c->range -= 2;
    if (c->offset >= c->range) return 1;
    while (c->range < 256) {
        c->range <<= 1;
        c->offset = (c->offset << 1) | cd_bit(c);
    }
    return 0;
}

// --- encoder engine (§9.3.4) ---

struct CabEnc {
    uint8_t* out;
    long cap, nbytes;
    uint64_t acc;          // bit accumulator (MSB-first like BW)
    int nbits;
    uint32_t low, range;
    int outstanding;
    int first;             // suppress the very first put bit
    uint8_t state[1024];
    uint8_t mps[1024];
    int overflow;
};

inline void ce_rawbit(CabEnc* e, int b) {
    e->acc = (e->acc << 1) | (unsigned)b;
    if (++e->nbits == 8) {
        if (e->nbytes >= e->cap) { e->overflow = 1; e->nbits = 0; return; }
        e->out[e->nbytes++] = (uint8_t)(e->acc & 0xff);
        e->nbits = 0;
    }
}

inline void ce_putbit(CabEnc* e, int b) {
    if (e->first) e->first = 0;
    else ce_rawbit(e, b);
    while (e->outstanding > 0) { ce_rawbit(e, !b); e->outstanding--; }
}

inline void ce_renorm(CabEnc* e) {
    while (e->range < 256) {
        if (e->low < 256) ce_putbit(e, 0);
        else if (e->low >= 512) { e->low -= 512; ce_putbit(e, 1); }
        else { e->low -= 256; e->outstanding++; }
        e->low <<= 1;
        e->range <<= 1;
    }
}

inline void ce_decision(CabEnc* e, int ctx, int bin) {
    uint32_t lps = CAB_LPS[e->state[ctx]][(e->range >> 6) & 3];
    e->range -= lps;
    if (bin != e->mps[ctx]) {
        e->low += e->range;
        e->range = lps;
        if (e->state[ctx] == 0) e->mps[ctx] = !e->mps[ctx];
        e->state[ctx] = CAB_TRANS_LPS[e->state[ctx]];
    } else {
        if (e->state[ctx] < 62) e->state[ctx]++;
    }
    ce_renorm(e);
}

inline void ce_bypass(CabEnc* e, int bin) {
    e->low <<= 1;
    if (bin) e->low += e->range;
    if (e->low >= 1024) { ce_putbit(e, 1); e->low -= 1024; }
    else if (e->low < 512) ce_putbit(e, 0);
    else { e->outstanding++; e->low -= 512; }
}

inline void ce_terminate(CabEnc* e, int bin) {
    e->range -= 2;
    if (bin) {
        e->low += e->range;
        e->range = 2;
        ce_renorm(e);
        // EncodeFlush (§9.3.4.6)
        ce_putbit(e, (e->low >> 9) & 1);
        ce_rawbit(e, (e->low >> 8) & 1);
        ce_rawbit(e, 1);               // rbsp stop bit
        while (e->nbits) ce_rawbit(e, 0);
    } else {
        ce_renorm(e);
    }
}

// --- CABAC slice context (neighbor caches beyond SliceCtx) ---

struct CabacSlice {
    SliceCtx* c;
    CabDec* dec;           // one of dec/enc is active
    CabEnc* enc;
    int is_p;
    // per-MB state tables for context derivation
    uint16_t* cbpx;        // cbp | dcDC bits (0x40<<c chromaDC, 0x100 lumaDC)
    int8_t* skipf;         // mb is skip
    int8_t* cmode;         // chroma pred mode
    int8_t* itype;         // 0 none/inter, 1 = I4x4, 2 = I16/IPCM
    int16_t* amvd;         // [h4*w4*2] abs mvd per 4x4
    int16_t* amvd1;        // list 1 (B)
    int last_dqp;
    int mb_w, mb_h;
    int8_t* t8f;      // per-MB transform_size_8x8 flags
};

// unified get/put bin so the syntax walk is written once
inline int cs_bin(CabacSlice* s, int ctx, int bin) {
    if (s->dec) return cd_decision(s->dec, ctx);
    ce_decision(s->enc, ctx, bin);
    return bin;
}
inline int cs_bypass(CabacSlice* s, int bin) {
    if (s->dec) return cd_bypass(s->dec);
    ce_bypass(s->enc, bin);
    return bin;
}
inline int cs_term(CabacSlice* s, int bin) {
    if (s->dec) return cd_terminate(s->dec);
    ce_terminate(s->enc, bin);
    return bin;
}

// neighbor MB index or -1 (availability = decoded in this slice)
inline int nb_mb(const CabacSlice* s, int mb, int dx, int dy) {
    int mx = mb % s->mb_w + dx, my = mb / s->mb_w + dy;
    if (mx < 0 || my < 0 || mx >= s->mb_w || my >= s->mb_h) return -1;
    int n = my * s->mb_w + mx;
    return s->c->decoded[n] ? n : -1;
}

// extended cbp of a neighbor for cbf ctx (h264_mvpred.h:721 semantics)
inline int nb_cbpx(const CabacSlice* s, int mb, int dx, int dy,
                   int cur_intra) {
    int n = nb_mb(s, mb, dx, dy);
    if (n < 0) return cur_intra ? 0x7CF : 0x00F;
    return s->cbpx[n];
}

// nnz of neighbor 4x4 block on a grid (64 when unavailable & intra)
inline int nb_nnz(const CabacSlice* s, const int8_t* grid, int w, int h,
                  int bx, int by, int cur_intra) {
    if (bx < 0 || by < 0 || bx >= w || by >= h)
        return cur_intra ? 64 : 0;
    int v = grid[by * w + bx];
    if (v < 0) return cur_intra ? 64 : 0;   // other slice / undecoded
    return v;
}

// ---- residual block in CABAC form (§9.3.3.1.3 / residual_block_cabac)
// For decode: fills out[] (zigzag levels), returns total nonzero count.
// For encode: reads out[] levels. cbf handled by the caller.
// cat: 0 lumaDC 1 lumaAC 2 luma4x4 3 chromaDC 4 chromaAC
static const int SIG_OFF[6] = {105 + 0, 105 + 15, 105 + 29, 105 + 44,
                               105 + 47, 402};
static const int LAST_OFF[6] = {166 + 0, 166 + 15, 166 + 29, 166 + 44,
                                166 + 47, 417};
static const int ABS_OFF[6] = {227 + 0, 227 + 10, 227 + 20, 227 + 30,
                               227 + 39, 426};
// cat-5 significance-map ctx increments (Table 9-43, frame coding;
// cf. h264_cabac.c significant_coeff_flag_offset_8x8[0] and cabac.c
// last_coeff_flag_offset_8x8)
static const uint8_t SIG8_MAP[63] = {
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12};
static const uint8_t LAST8_MAP[63] = {
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8};
static const uint8_t LVL1_CTX[8] = {1, 2, 3, 4, 0, 0, 0, 0};
static const uint8_t GT1_CTX[8] = {5, 5, 5, 5, 6, 7, 8, 9};
static const uint8_t LVL_TRANS0[8] = {1, 2, 3, 3, 4, 5, 6, 7};
static const uint8_t LVL_TRANS1[8] = {4, 4, 4, 4, 5, 6, 7, 7};

int cab_residual(CabacSlice* s, int cat, int16_t* zz, int first,
                 int maxc) {
    // significance map over zz positions first..first+maxc-1; position
    // maxc-1 is implicitly significant when no last flag terminated.
    // cat 5 (luma 8x8) shares 15/9 contexts across 63 positions via
    // the Table 9-43 increment maps.
    int idx[64], count = 0;
    const int c8 = cat == 5;
    if (s->dec) {
        int i;
        for (i = 0; i < maxc - 1; i++) {
            if (cd_decision(s->dec,
                            SIG_OFF[cat] + (c8 ? SIG8_MAP[i] : i))) {
                idx[count++] = i;
                if (cd_decision(s->dec,
                                LAST_OFF[cat]
                                + (c8 ? LAST8_MAP[i] : i))) break;
            }
        }
        if (i == maxc - 1) idx[count++] = i;   // implicit last
    } else {
        int lastnz = -1;
        for (int i = 0; i < maxc; i++)
            if (zz[first + i]) lastnz = i;
        for (int i = 0; i < maxc - 1 && i <= lastnz; i++) {
            int sig = zz[first + i] != 0;
            ce_decision(s->enc, SIG_OFF[cat] + (c8 ? SIG8_MAP[i] : i),
                        sig);
            if (sig) {
                idx[count++] = i;
                ce_decision(s->enc,
                            LAST_OFF[cat] + (c8 ? LAST8_MAP[i] : i),
                            i == lastnz);
            }
        }
        if (lastnz == maxc - 1) idx[count++] = lastnz;
    }
    // levels, last significant coefficient first (node-ctx machine)
    int node = 0;
    for (int k = count - 1; k >= 0; k--) {
        int pos = first + idx[k];
        int abslev, sign;
        if (s->dec) {
            if (!cd_decision(s->dec, ABS_OFF[cat] + LVL1_CTX[node])) {
                abslev = 1;
                node = LVL_TRANS0[node];
            } else {
                abslev = 2;
                int gctx = ABS_OFF[cat] + GT1_CTX[node];
                node = LVL_TRANS1[node];
                while (abslev < 15 && cd_decision(s->dec, gctx))
                    abslev++;
                if (abslev >= 15) {
                    int j = 0;
                    while (cd_bypass(s->dec) && j < 23) j++;
                    int v = 1;
                    while (j--) v = (v << 1) | cd_bypass(s->dec);
                    abslev = v + 14;
                }
            }
            sign = cd_bypass(s->dec);
            int lv = sign ? -abslev : abslev;
            if (lv < -32768 || lv > 32767) { s->dec->error = 1; lv = 0; }
            zz[pos] = (int16_t)lv;
        } else {
            int lv = zz[pos];
            abslev = lv < 0 ? -lv : lv;
            sign = lv < 0;
            if (abslev == 1) {
                ce_decision(s->enc, ABS_OFF[cat] + LVL1_CTX[node], 0);
                node = LVL_TRANS0[node];
            } else {
                ce_decision(s->enc, ABS_OFF[cat] + LVL1_CTX[node], 1);
                int gctx = ABS_OFF[cat] + GT1_CTX[node];
                node = LVL_TRANS1[node];
                int u = abslev < 15 ? abslev : 15;
                for (int t = 2; t < u; t++) ce_decision(s->enc, gctx, 1);
                if (abslev < 15) ce_decision(s->enc, gctx, 0);
                else {
                    // decoder stops at 15 without a terminator bin;
                    // EG0 suffix carries abslev-14 >= 1
                    int v = abslev - 14;
                    int j = 0;
                    while ((2 << j) <= v) j++;     // v >= 2^j+... prefix len
                    for (int t = 0; t < j; t++) ce_bypass(s->enc, 1);
                    ce_bypass(s->enc, 0);
                    for (int t = j - 1; t >= 0; t--)
                        ce_bypass(s->enc, (v >> t) & 1);
                }
            }
            ce_bypass(s->enc, sign);
        }
    }
    return count;
}

}  // namespace

namespace {

// intra mb_type prefix/suffix (§9.3.2.5; layout per h264_cabac.c
// decode_cabac_intra_mb_type). Returns 0=I4x4, 1..24=I16, 25=PCM.
int cs_intra_mb_type(CabacSlice* s, int base, int intra_slice,
                     int mb, int val) {
    // val (encode): 0 I4x4; 1+ imode16 + 4*cbp_chroma + 12*(cbp_luma!=0)
    int first_ctx = base;
    if (intra_slice) {
        int ctx = 0;
        int na = nb_mb(s, mb, -1, 0), nb = nb_mb(s, mb, 0, -1);
        if (na >= 0 && s->itype[na] == 2) ctx++;
        if (nb >= 0 && s->itype[nb] == 2) ctx++;
        first_ctx = base + ctx;
    }
    int is16 = cs_bin(s, first_ctx, val != 0);
    if (!is16) return 0;
    int sbase = base + (intra_slice ? 2 : 0);
    if (cs_term(s, 0)) return 25;          // I_PCM
    int t = val - 1;                       // encode-side components
    int cbl = cs_bin(s, sbase + 1, (t / 12) & 1);
    int mbt = 1 + 12 * cbl;
    int cc = (t / 4) % 3;
    if (cs_bin(s, sbase + 2, cc != 0))
        mbt += 4 + 4 * cs_bin(s, sbase + 2 + intra_slice, cc == 2);
    mbt += 2 * cs_bin(s, sbase + 3 + intra_slice, (t % 4) >> 1);
    mbt += 1 * cs_bin(s, sbase + 3 + 2 * intra_slice, t & 1);
    return mbt;
}

// mvd component (§9.3.2.3 UEG3): ctxbase 40 (x) / 47 (y)
int cs_mvd(CabacSlice* s, int ctxbase, int amvd, int val) {
    int inc = (amvd > 32) ? 2 : (amvd > 2 ? 1 : 0);
    int av = val < 0 ? -val : val;
    if (!cs_bin(s, ctxbase + inc, av != 0)) return 0;
    int mvd = 1;
    int ctx = ctxbase + 3;
    while (mvd < 9 && cs_bin(s, ctx, av > mvd)) {
        if (mvd < 4) ctx++;
        mvd++;
    }
    if (mvd >= 9) {
        if (s->dec) {
            int k = 3;
            while (cd_bypass(s->dec)) {
                mvd += 1 << k;
                k++;
                if (k > 24) { s->dec->error = 1; return 0; }
            }
            while (k--) mvd += cd_bypass(s->dec) << k;
        } else {
            // EG3 suffix for av - 9 >= 0
            int v = av - 9;
            int k = 3;
            while (v >= (1 << k)) { ce_bypass(s->enc, 1); v -= 1 << k; k++; }
            ce_bypass(s->enc, 0);
            while (k-- > 0) ce_bypass(s->enc, (v >> k) & 1);
            mvd = av;
        }
    }
    int sign = cs_bypass(s, val < 0);
    return sign ? -mvd : mvd;
}

int cs_ref(CabacSlice* s, int mb, int x4, int y4, int val) {
    // ctx from neighbor refIdx > 0 (refg grid; intra/unavailable -> 0)
    int ra = (x4 > 0) ? s->c->refg[y4 * s->c->w4 + x4 - 1] : -2;
    int rb = (y4 > 0) ? s->c->refg[(y4 - 1) * s->c->w4 + x4] : -2;
    int ctx = (ra > 0 ? 1 : 0) + (rb > 0 ? 2 : 0);
    int ref = 0;
    while (cs_bin(s, 54 + ctx, val > ref)) {
        ref++;
        ctx = (ctx >> 2) + 4;
        if (ref >= 32) return -1;
    }
    return ref;
}

int cs_dqp(CabacSlice* s, int val) {
    // mapped unary: dqp>0 -> 2d-1, dqp<0 -> -2d (§9.3.2.7)
    int mapped = val > 0 ? 2 * val - 1 : -2 * val;
    if (!cs_bin(s, 60 + (s->last_dqp != 0), mapped != 0)) {
        s->last_dqp = 0;
        return 0;
    }
    int v = 1, ctx = 2;
    while (v < 104 && cs_bin(s, 60 + ctx, mapped > v)) { ctx = 3; v++; }
    int dqp = (v & 1) ? (v + 1) >> 1 : -((v + 1) >> 1);
    s->last_dqp = dqp;
    return dqp;
}

// cbf contexts (§9.3.3.1.1.9); cat 0..4, blk grid coords for AC cats
int cs_cbf(CabacSlice* s, int cat, int mb, int gy, int gx, int ch,
           int cur_intra, int val) {
    static const int BASE[5] = {85, 89, 93, 97, 101};
    int nza, nzb;
    if (cat == 0) {               // luma DC: neighbor MB bit 0x100
        nza = nb_cbpx(s, mb, -1, 0, cur_intra) & 0x100;
        nzb = nb_cbpx(s, mb, 0, -1, cur_intra) & 0x100;
    } else if (cat == 3) {        // chroma DC: bit 0x40 << ch
        nza = nb_cbpx(s, mb, -1, 0, cur_intra) & (0x40 << ch);
        nzb = nb_cbpx(s, mb, 0, -1, cur_intra) & (0x40 << ch);
    } else if (cat == 4) {        // chroma AC on the 2x2-per-MB grid
        const int8_t* g = ch == 0 ? s->c->tcU : s->c->tcV;
        nza = nb_nnz(s, g, s->c->wc, s->c->hc, gx - 1, gy, cur_intra);
        nzb = nb_nnz(s, g, s->c->wc, s->c->hc, gx, gy - 1, cur_intra);
    } else {                      // luma 4x4 / AC
        nza = nb_nnz(s, s->c->tcY, s->c->w4, s->c->h4, gx - 1, gy,
                     cur_intra);
        nzb = nb_nnz(s, s->c->tcY, s->c->w4, s->c->h4, gx, gy - 1,
                     cur_intra);
    }
    int ctx = (nza > 0 ? 1 : 0) + (nzb > 0 ? 2 : 0);
    return cs_bin(s, BASE[cat] + ctx, val);
}

}  // namespace

// ---------------------------------------------------------------------------
// CABAC slice data: one function, two directions.
//
// mode 0 (decode): parse rbsp from start_bit, fill the per-MB tensors
//   (same layout as h264_decode_slice_cavlc), end_state = {bitpos, mbs}.
// mode 1 (encode): read the tensors and produce the CABAC slice data
//   (alignment ones + arithmetic payload incl. the final flush/stop)
//   into out/out_cap; end_state[0] = output BYTE count, end_state[1] =
//   mbs processed. The bit prefix before slice data (slice header) is
//   NOT written here -- the caller glues header bits + alignment.
//
// Constraints: frame MBs, 4:2:0, no 8x8 transform, I/P slices, no PCM.
extern "C" int h264_cabac_slice(
    int mode, const uint8_t* rbsp, int nbytes, int start_bit,
    uint8_t* out, long out_cap,
    int mb_w, int mb_h, int first_mb,
    int slice_type, int slice_qp, int num_ref_idx_l0, int cabac_init_idc,
    int32_t* mb_kind, int32_t* mb_info, int8_t* i4modes,
    int16_t* mv_out, int8_t* ref_out, int32_t* qp_out,
    int16_t* coeffs, int16_t* ncoef, int32_t* end_state,
    int num_ref_idx_l1, int16_t* mv1_out, int8_t* ref1_out,
    int transform_8x8_mode)
{
    const int nMB = mb_w * mb_h;
    const int is_b = slice_type == 1;
    const int is_p = slice_type == 0 || is_b;
    const int dec = mode == 0;
    if (first_mb < 0 || first_mb >= nMB) return -1;

    SliceCtx c;
    c.mb_w = mb_w; c.mb_h = mb_h;
    c.w4 = mb_w * 4; c.h4 = mb_h * 4;
    c.wc = mb_w * 2; c.hc = mb_h * 2;
    c.tcY = (int8_t*)malloc((size_t)c.w4 * c.h4);
    c.tcU = (int8_t*)malloc((size_t)c.wc * c.hc);
    c.tcV = (int8_t*)malloc((size_t)c.wc * c.hc);
    c.mvg = (int16_t*)calloc((size_t)c.w4 * c.h4 * 2, sizeof(int16_t));
    c.refg = (int8_t*)malloc((size_t)c.w4 * c.h4);
    c.i4g = (int8_t*)malloc((size_t)c.w4 * c.h4);
    c.decoded = (uint8_t*)calloc((size_t)nMB, 1);
    c.mvg1 = (int16_t*)calloc((size_t)c.w4 * c.h4 * 2, sizeof(int16_t));
    c.refg1 = (int8_t*)malloc((size_t)c.w4 * c.h4);
    memset(c.tcY, -1, (size_t)c.w4 * c.h4);
    memset(c.tcU, -1, (size_t)c.wc * c.hc);
    memset(c.tcV, -1, (size_t)c.wc * c.hc);
    memset(c.refg, -2, (size_t)c.w4 * c.h4);
    memset(c.refg1, -2, (size_t)c.w4 * c.h4);
    memset(c.i4g, -2, (size_t)c.w4 * c.h4);

    CabDec cd;
    CabEnc ce;
    CabacSlice s;
    s.c = &c; s.is_p = is_p; s.mb_w = mb_w; s.mb_h = mb_h;
    s.last_dqp = 0;
    s.cbpx = (uint16_t*)calloc(nMB, 2);
    s.skipf = (int8_t*)calloc(nMB, 1);
    s.cmode = (int8_t*)calloc(nMB, 1);
    s.itype = (int8_t*)calloc(nMB, 1);
    s.amvd = (int16_t*)calloc((size_t)c.w4 * c.h4 * 2, sizeof(int16_t));
    s.amvd1 = (int16_t*)calloc((size_t)c.w4 * c.h4 * 2,
                               sizeof(int16_t));
    s.t8f = (int8_t*)calloc(nMB, 1);
    if (dec) {
        s.dec = &cd; s.enc = 0;
        cab_init_contexts(cd.state, cd.mps, slice_qp,
                          is_p ? CAB_INIT_PB[cabac_init_idc]
                               : CAB_INIT_I);
        cd_start(&cd, rbsp, nbytes * 8, start_bit);
    } else {
        s.dec = 0; s.enc = &ce;
        memset(&ce, 0, sizeof(ce));
        ce.out = out; ce.cap = out_cap;
        ce.low = 0; ce.range = 510; ce.first = 1;
        cab_init_contexts(ce.state, ce.mps, slice_qp,
                          is_p ? CAB_INIT_PB[cabac_init_idc]
                               : CAB_INIT_I);
    }

    int qp = slice_qp;
    int err = 0;
    int mb = first_mb;

    #define CFAIL(code) do { err = (code); goto done; } while (0)

    for (; mb < nMB; mb++) {
        const int my = mb / mb_w, mx = mb % mb_w;
        const int x4 = mx * 4, y4 = my * 4;

        if (is_p) {
            // mb_skip_flag, ctx from left/top non-skip
            int na = nb_mb(&s, mb, -1, 0), nb = nb_mb(&s, mb, 0, -1);
            int ctx = (na >= 0 && !s.skipf[na] ? 1 : 0)
                    + (nb >= 0 && !s.skipf[nb] ? 1 : 0);
            if (is_b) ctx += 13;
            int skip = cs_bin(&s, 11 + ctx,
                              dec ? 0 : (!is_b
                                         && mb_kind[mb] == K_PSKIP));
            if (skip && is_b) CFAIL(-8);    // B_Skip (direct)
            if (skip) {
                // P_SKIP: same derivation as the CAVLC path
                int refA, mvxA, mvyA, refB, mvxB, mvyB;
                int availA = fetch_n(&c, x4 - 1, y4, &refA, &mvxA, &mvyA);
                int availB = fetch_n(&c, x4, y4 - 1, &refB, &mvxB, &mvyB);
                int mvx = 0, mvy = 0;
                if (availA && availB &&
                    !(refA == 0 && mvxA == 0 && mvyA == 0) &&
                    !(refB == 0 && mvxB == 0 && mvyB == 0))
                    mv_pred(&c, x4, y4, 4, 4, 0, 0, &mvx, &mvy);
                fill_part(&c, x4, y4, 4, 4, 0, mvx, mvy);
                if (dec) {
                    mb_kind[mb] = K_PSKIP;
                    mb_info[mb] = 0;
                    ref_out[mb * 4 + 0] = ref_out[mb * 4 + 1] = 0;
                    ref_out[mb * 4 + 2] = ref_out[mb * 4 + 3] = 0;
                    for (int i = 0; i < 16; i++) {
                        mv_out[(mb * 16 + i) * 2] = (int16_t)mvx;
                        mv_out[(mb * 16 + i) * 2 + 1] = (int16_t)mvy;
                    }
                }
                qp_out[mb] = qp;
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++) {
                        c.tcY[(y4 + y) * c.w4 + x4 + x] = 0;
                        c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
                    }
                for (int y = 0; y < 2; y++)
                    for (int x = 0; x < 2; x++) {
                        c.tcU[(my * 2 + y) * c.wc + mx * 2 + x] = 0;
                        c.tcV[(my * 2 + y) * c.wc + mx * 2 + x] = 0;
                    }
                s.skipf[mb] = 1;
                s.last_dqp = 0;
                c.decoded[mb] = 1;
                if (dec) { if (cd.error) CFAIL(-2); }
                int eos = cs_term(&s, mb == nMB - 1);
                if (dec && eos) { mb++; goto finish; }
                if (!dec && mb == nMB - 1) goto finish_inc;
                continue;
            }
        }

        {
        int kind, imode16 = 0, cbp = 0, chroma_mode = 0;
        int enc_kind = dec ? 0 : mb_kind[mb];
        int enc_info = dec ? 0 : mb_info[mb];

        int mbt = -1;          // P inter type 0..3, or -1 for intra
        int bmbt = -1;         // B 16x16 family: 1 L0, 2 L1, 3 Bi
        if (is_b) {
            int enc_is_intra = !dec && enc_kind >= K_I4X4;
            int enc_bmbt = 1;
            if (!dec && !enc_is_intra) {
                int l0u = ref_out[mb * 4] >= 0;
                int l1u = ref1_out[mb * 4] >= 0;
                enc_bmbt = l0u && l1u ? 3 : (l1u ? 2 : 1);
            }
            // ctx: neighbors available and not direct (ours never are)
            int na = nb_mb(&s, mb, -1, 0), nb2 = nb_mb(&s, mb, 0, -1);
            int ctx = (na >= 0 ? 1 : 0) + (nb2 >= 0 ? 1 : 0);
            if (!cs_bin(&s, 27 + ctx, 1))
                CFAIL(-8);                 // B_Direct_16x16
            if (!cs_bin(&s, 27 + 3,
                        enc_is_intra || enc_bmbt == 3)) {
                bmbt = 1 + cs_bin(&s, 27 + 5, enc_bmbt == 2);
                kind = K_INTER;
            } else {
                // 4-bin suffix: 0 -> Bi_16x16; 13 -> intra prefix
                int target = enc_is_intra ? 13 : 0;
                int bits = cs_bin(&s, 27 + 4, (target >> 3) & 1) << 3;
                bits += cs_bin(&s, 27 + 5, (target >> 2) & 1) << 2;
                bits += cs_bin(&s, 27 + 5, (target >> 1) & 1) << 1;
                bits += cs_bin(&s, 27 + 5, target & 1);
                if (bits == 0) {
                    bmbt = 3;
                    kind = K_INTER;
                } else if (bits == 13) {
                    int v;
                    if (!dec) {
                        if (enc_kind == K_I4X4
                            || enc_kind == K_I8X8) v = 0;
                        else {
                            int t = (enc_info & 15)
                                + 4 * (((enc_info >> 8) >> 4) & 3)
                                + 12 * (((enc_info >> 8) & 15) ? 1 : 0);
                            v = 1 + t;
                        }
                    } else v = 0;
                    int r = cs_intra_mb_type(&s, 32, 0, mb, v);
                    if (r == 25) CFAIL(-5);
                    if (r == 0) kind = K_I4X4;
                    else {
                        kind = K_I16;
                        int t = r - 1;
                        imode16 = t % 4;
                        cbp = ((t / 4) % 3) << 4;
                        if (t >= 12) cbp |= 15;
                    }
                } else {
                    CFAIL(-8);             // partitions / B_8x8
                }
            }
        } else if (is_p && !is_b) {
            int enc_is_intra = !dec && enc_kind >= K_I4X4;
            int enc_mbt = 0;
            if (!dec && !enc_is_intra) {
                // recover the partition shape from ref/mv layout
                // stored in tensor form: examine per-8x8 refs + mvs
                // (P_8x8 when any sub-partition differs)
                const int16_t* m = mv_out + (size_t)mb * 32;
                const int8_t* r = ref_out + mb * 4;
                int same_all = 1, top_eq = 1, bot_eq = 1, l_eq = 1,
                    r_eq = 1;
                for (int i = 1; i < 16; i++)
                    same_all &= m[2 * i] == m[0] && m[2 * i + 1] == m[1];
                same_all &= r[0] == r[1] && r[0] == r[2] && r[0] == r[3];
                // 16x8: rows 0-1 equal and rows 2-3 equal
                for (int i = 1; i < 8; i++)
                    top_eq &= m[2 * i] == m[0] && m[2 * i + 1] == m[1];
                for (int i = 9; i < 16; i++)
                    bot_eq &= m[2 * i] == m[16] && m[2 * i + 1] == m[17];
                top_eq &= r[0] == r[1]; bot_eq &= r[2] == r[3];
                // 8x16: cols
                static const int LBLK[8] = {0, 1, 4, 5, 8, 9, 12, 13};
                static const int RBLK[8] = {2, 3, 6, 7, 10, 11, 14, 15};
                for (int i = 1; i < 8; i++) {
                    l_eq &= m[2 * LBLK[i]] == m[2 * LBLK[0]]
                         && m[2 * LBLK[i] + 1] == m[2 * LBLK[0] + 1];
                    r_eq &= m[2 * RBLK[i]] == m[2 * RBLK[0]]
                         && m[2 * RBLK[i] + 1] == m[2 * RBLK[0] + 1];
                }
                l_eq &= r[0] == r[2]; r_eq &= r[1] == r[3];
                if (same_all) enc_mbt = 0;
                else if (top_eq && bot_eq) enc_mbt = 1;
                else if (l_eq && r_eq) enc_mbt = 2;
                else enc_mbt = 3;
            }
            // mb_type tree (P): b14: intra?; else b15/b16/b17
            if (cs_bin(&s, 14, enc_is_intra)) {
                int v;
                if (!dec) {
                    if (enc_kind == K_I4X4
                        || enc_kind == K_I8X8) v = 0;
                    else {
                        int t = (enc_info & 15)
                            + 4 * (((enc_info >> 8) >> 4) & 3)
                            + 12 * (((enc_info >> 8) & 15) ? 1 : 0);
                        v = 1 + t;
                    }
                } else v = 0;
                int r = cs_intra_mb_type(&s, 17, 0, mb, v);
                if (r == 25) CFAIL(-5);
                mbt = -1;
                if (r == 0) kind = K_I4X4;
                else {
                    kind = K_I16;
                    int t = r - 1;
                    imode16 = t % 4;
                    cbp = ((t / 4) % 3) << 4;
                    if (t >= 12) cbp |= 15;
                }
            } else {
                if (cs_bin(&s, 15, enc_mbt == 1 || enc_mbt == 2)) {
                    mbt = 2 - cs_bin(&s, 17, enc_mbt == 1);
                } else {
                    mbt = 3 * cs_bin(&s, 16, enc_mbt == 3);
                }
                kind = K_INTER;
            }
        } else {
            int v;
            if (!dec) {
                if (enc_kind == K_I4X4
                    || enc_kind == K_I8X8) v = 0;
                else {
                    int t = (enc_info & 15)
                        + 4 * (((enc_info >> 8) >> 4) & 3)
                        + 12 * (((enc_info >> 8) & 15) ? 1 : 0);
                    v = 1 + t;
                }
            } else v = 0;
            int r = cs_intra_mb_type(&s, 3, 1, mb, v);
            if (r == 25) CFAIL(-5);
            if (r == 0) kind = K_I4X4;
            else {
                kind = K_I16;
                int t = r - 1;
                imode16 = t % 4;
                cbp = ((t / 4) % 3) << 4;
                if (t >= 12) cbp |= 15;
            }
        }

        // transform_size_8x8_flag for I_NxN (§7.3.5: right after
        // mb_type; ctx 399 + left/top t8 flags)
        int t8 = 0;
        int t8_ok = 1;
        if (transform_8x8_mode && kind == K_I4X4) {
            int na = nb_mb(&s, mb, -1, 0), nb3 = nb_mb(&s, mb, 0, -1);
            int inc = (na >= 0 && s.t8f[na] ? 1 : 0)
                    + (nb3 >= 0 && s.t8f[nb3] ? 1 : 0);
            t8 = cs_bin(&s, 399 + inc,
                        dec ? 0 : ((enc_info & INFO_T8) != 0));
            if (t8) kind = K_I8X8;
        }
        if (is_b && kind == K_INTER) {
            const int use0 = bmbt == 1 || bmbt == 3;
            const int use1 = bmbt == 2 || bmbt == 3;
            int r0 = -1, r1 = -1;
            if (use0 && num_ref_idx_l0 > 1) {
                r0 = cs_ref(&s, mb, x4, y4,
                            dec ? 0 : ref_out[mb * 4]);
                if (r0 < 0) CFAIL(-3);
            } else if (use0) r0 = 0;
            if (use1 && num_ref_idx_l1 > 1) {
                // ref ctx for list 1 reads list-1 neighbor grids
                int16_t* sm = c.mvg; int8_t* sr_ = c.refg;
                c.mvg = c.mvg1; c.refg = c.refg1;
                r1 = cs_ref(&s, mb, x4, y4,
                            dec ? 0 : ref1_out[mb * 4]);
                c.mvg = sm; c.refg = sr_;
                if (r1 < 0) CFAIL(-3);
            } else if (use1) r1 = 0;
            for (int list = 0; list < 2; list++) {
                const int use = list ? use1 : use0;
                const int rr = list ? r1 : r0;
                int16_t* sm = c.mvg; int8_t* sr_ = c.refg;
                int16_t* sa = s.amvd;
                if (list) {
                    c.mvg = c.mvg1; c.refg = c.refg1;
                    s.amvd = s.amvd1;
                }
                if (use) {
                    int px, py;
                    mv_pred(&c, x4, y4, 4, 4, rr, 0, &px, &py);
                    const int16_t* emvl = (list ? mv1_out : mv_out)
                        + (size_t)mb * 32;
                    int tx = dec ? 0 : emvl[0] - px;
                    int ty = dec ? 0 : emvl[1] - py;
                    int la = x4 > 0 ? s.amvd[(y4 * c.w4 + x4 - 1) * 2] : 0;
                    int ta = y4 > 0 ? s.amvd[((y4 - 1) * c.w4 + x4) * 2] : 0;
                    int lb = x4 > 0 ? s.amvd[(y4 * c.w4 + x4 - 1) * 2 + 1] : 0;
                    int tb = y4 > 0 ? s.amvd[((y4 - 1) * c.w4 + x4) * 2 + 1] : 0;
                    int dx = cs_mvd(&s, 40, la + ta, tx);
                    int dy = cs_mvd(&s, 47, lb + tb, ty);
                    fill_part(&c, x4, y4, 4, 4, rr, px + dx, py + dy);
                    for (int y = 0; y < 4; y++)
                        for (int x = 0; x < 4; x++) {
                            s.amvd[((y4 + y) * c.w4 + x4 + x) * 2] =
                                (int16_t)(dx < 0 ? -dx : dx);
                            s.amvd[((y4 + y) * c.w4 + x4 + x) * 2 + 1] =
                                (int16_t)(dy < 0 ? -dy : dy);
                        }
                } else {
                    fill_part(&c, x4, y4, 4, 4, -1, 0, 0);
                    for (int y = 0; y < 4; y++)
                        for (int x = 0; x < 4; x++) {
                            s.amvd[((y4 + y) * c.w4 + x4 + x) * 2] = 0;
                            s.amvd[((y4 + y) * c.w4 + x4 + x) * 2 + 1]
                                = 0;
                        }
                }
                if (list) {
                    c.mvg = sm; c.refg = sr_; s.amvd = sa;
                }
            }
            if (dec) {
                for (int i = 0; i < 4; i++) {
                    ref_out[mb * 4 + i] = (int8_t)r0;
                    ref1_out[mb * 4 + i] = (int8_t)r1;
                }
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++) {
                        int gi = (y4 + y) * c.w4 + x4 + x;
                        mv_out[(mb * 16 + y * 4 + x) * 2] =
                            c.mvg[gi * 2];
                        mv_out[(mb * 16 + y * 4 + x) * 2 + 1] =
                            c.mvg[gi * 2 + 1];
                        mv1_out[(mb * 16 + y * 4 + x) * 2] =
                            c.mvg1[gi * 2];
                        mv1_out[(mb * 16 + y * 4 + x) * 2 + 1] =
                            c.mvg1[gi * 2 + 1];
                    }
            }
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++)
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
        } else if (kind == K_INTER) {
            int refs[4] = {0, 0, 0, 0};
            const int16_t* emv = mv_out + (size_t)mb * 32;
            const int8_t* eref = ref_out + mb * 4;
            if (mbt == 0) {
                int rv = num_ref_idx_l0 > 1
                    ? cs_ref(&s, mb, x4, y4, dec ? 0 : eref[0]) : 0;
                if (rv < 0) CFAIL(-3);
                refs[0] = refs[1] = refs[2] = refs[3] = rv;
                int px, py;
                mv_pred(&c, x4, y4, 4, 4, rv, 0, &px, &py);
                int tx = dec ? 0 : emv[0] - px, ty = dec ? 0 : emv[1] - py;
                int aax = s.amvd[(y4 * c.w4 + x4) * 2 + 0];
                // amvd ctx: sums of left/top per component
                int ax = 0, ay = 0;
                {
                    int la = x4 > 0 ? s.amvd[(y4 * c.w4 + x4 - 1) * 2] : 0;
                    int ta = y4 > 0 ? s.amvd[((y4 - 1) * c.w4 + x4) * 2] : 0;
                    ax = la + ta;
                    int lb = x4 > 0 ? s.amvd[(y4 * c.w4 + x4 - 1) * 2 + 1] : 0;
                    int tb = y4 > 0 ? s.amvd[((y4 - 1) * c.w4 + x4) * 2 + 1] : 0;
                    ay = lb + tb;
                }
                (void)aax;
                int dx = cs_mvd(&s, 40, ax, tx);
                int dy = cs_mvd(&s, 47, ay, ty);
                fill_part(&c, x4, y4, 4, 4, rv, px + dx, py + dy);
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++) {
                        s.amvd[((y4 + y) * c.w4 + x4 + x) * 2] =
                            (int16_t)(dx < 0 ? -dx : dx);
                        s.amvd[((y4 + y) * c.w4 + x4 + x) * 2 + 1] =
                            (int16_t)(dy < 0 ? -dy : dy);
                    }
            } else if (mbt == 1 || mbt == 2) {
                // two partitions; refs then mvds in partition order
                int r0 = 0, r1 = 0;
                int pk0 = mbt == 1 ? 1 : 3, pk1 = mbt == 1 ? 2 : 4;
                int p1x4 = mbt == 1 ? x4 : x4 + 2;
                int p1y4 = mbt == 1 ? y4 + 2 : y4;
                int pw = mbt == 1 ? 4 : 2, ph = mbt == 1 ? 2 : 4;
                if (num_ref_idx_l0 > 1) {
                    r0 = cs_ref(&s, mb, x4, y4,
                                dec ? 0 : eref[0]);
                    r1 = cs_ref(&s, mb, p1x4, p1y4,
                                dec ? 0 : eref[3]);
                    if (r0 < 0 || r1 < 0) CFAIL(-3);
                }
                for (int p = 0; p < 2; p++) {
                    int sx = p == 0 ? x4 : p1x4;
                    int sy = p == 0 ? y4 : p1y4;
                    int rr = p == 0 ? r0 : r1;
                    int pk = p == 0 ? pk0 : pk1;
                    int px, py;
                    mv_pred(&c, sx, sy, pw, ph, rr, pk, &px, &py);
                    const int bi = (sy - y4) * 4 + (sx - x4);
                    int tx = dec ? 0 : emv[2 * bi] - px;
                    int ty = dec ? 0 : emv[2 * bi + 1] - py;
                    int la = sx > 0 ? s.amvd[(sy * c.w4 + sx - 1) * 2] : 0;
                    int ta = sy > 0 ? s.amvd[((sy - 1) * c.w4 + sx) * 2] : 0;
                    int lb = sx > 0 ? s.amvd[(sy * c.w4 + sx - 1) * 2 + 1] : 0;
                    int tb = sy > 0 ? s.amvd[((sy - 1) * c.w4 + sx) * 2 + 1] : 0;
                    int dx = cs_mvd(&s, 40, la + ta, tx);
                    int dy = cs_mvd(&s, 47, lb + tb, ty);
                    fill_part(&c, sx, sy, pw, ph, rr, px + dx, py + dy);
                    for (int y = 0; y < ph; y++)
                        for (int x = 0; x < pw; x++) {
                            s.amvd[((sy + y) * c.w4 + sx + x) * 2] =
                                (int16_t)(dx < 0 ? -dx : dx);
                            s.amvd[((sy + y) * c.w4 + sx + x) * 2 + 1] =
                                (int16_t)(dy < 0 ? -dy : dy);
                        }
                }
                if (mbt == 1) { refs[0] = refs[1] = r0; refs[2] = refs[3] = r1; }
                else { refs[0] = refs[2] = r0; refs[1] = refs[3] = r1; }
            } else {
                // P_8x8: sub_mb_types, refs, then mvds
                int sub[4];
                for (int i = 0; i < 4; i++) {
                    int esub = 0;
                    if (!dec) {
                        // infer sub type from the mv field of this 8x8
                        int bx4 = x4 + (i & 1) * 2, by4 = y4 + (i >> 1) * 2;
                        const int16_t* m = emv;
                        int b0 = (by4 - y4) * 4 + (bx4 - x4);
                        int all_eq = 1, row_eq = 1, col_eq = 1;
                        int ids[4] = {b0, b0 + 1, b0 + 4, b0 + 5};
                        for (int k = 1; k < 4; k++)
                            all_eq &= m[2 * ids[k]] == m[2 * ids[0]]
                                   && m[2 * ids[k] + 1] == m[2 * ids[0] + 1];
                        row_eq = m[2 * ids[0]] == m[2 * ids[1]]
                              && m[2 * ids[0] + 1] == m[2 * ids[1] + 1]
                              && m[2 * ids[2]] == m[2 * ids[3]]
                              && m[2 * ids[2] + 1] == m[2 * ids[3] + 1];
                        col_eq = m[2 * ids[0]] == m[2 * ids[2]]
                              && m[2 * ids[0] + 1] == m[2 * ids[2] + 1]
                              && m[2 * ids[1]] == m[2 * ids[3]]
                              && m[2 * ids[1] + 1] == m[2 * ids[3] + 1];
                        if (all_eq) esub = 0;
                        else if (row_eq) esub = 1;
                        else if (col_eq) esub = 2;
                        else esub = 3;
                    }
                    // sub_mb_type tree: b21: 8x8; b22==0: 8x4;
                    // b23: 4x8 else 4x4
                    if (cs_bin(&s, 21, esub == 0)) sub[i] = 0;
                    else if (!cs_bin(&s, 22, esub != 1)) sub[i] = 1;
                    else if (cs_bin(&s, 23, esub == 2)) sub[i] = 2;
                    else sub[i] = 3;
                    if (sub[i] != 0) t8_ok = 0;
                }
                if (num_ref_idx_l0 > 1) {
                    for (int i = 0; i < 4; i++) {
                        int bx4 = x4 + (i & 1) * 2, by4 = y4 + (i >> 1) * 2;
                        refs[i] = cs_ref(&s, mb, bx4, by4,
                                         dec ? 0 : eref[i]);
                        if (refs[i] < 0) CFAIL(-3);
                    }
                }
                for (int i = 0; i < 4; i++) {
                    int bx4 = x4 + (i & 1) * 2, by4 = y4 + (i >> 1) * 2;
                    static const int NPART[4] = {1, 2, 2, 4};
                    static const int PW[4] = {2, 2, 1, 1};
                    static const int PH[4] = {2, 1, 2, 1};
                    int np = NPART[sub[i]], pw = PW[sub[i]],
                        ph = PH[sub[i]];
                    for (int p = 0; p < np; p++) {
                        int ox = 0, oy = 0;
                        if (sub[i] == 1) oy = p;
                        else if (sub[i] == 2) ox = p;
                        else if (sub[i] == 3) { ox = p & 1; oy = p >> 1; }
                        int sx = bx4 + ox * pw, sy = by4 + oy * ph;
                        int px, py;
                        mv_pred(&c, sx, sy, pw, ph, refs[i], 0, &px, &py);
                        const int bi = (sy - y4) * 4 + (sx - x4);
                        int tx = dec ? 0 : emv[2 * bi] - px;
                        int ty = dec ? 0 : emv[2 * bi + 1] - py;
                        int la = sx > 0 ? s.amvd[(sy * c.w4 + sx - 1) * 2] : 0;
                        int ta = sy > 0 ? s.amvd[((sy - 1) * c.w4 + sx) * 2] : 0;
                        int lb = sx > 0 ? s.amvd[(sy * c.w4 + sx - 1) * 2 + 1] : 0;
                        int tb = sy > 0 ? s.amvd[((sy - 1) * c.w4 + sx) * 2 + 1] : 0;
                        int dx = cs_mvd(&s, 40, la + ta, tx);
                        int dy = cs_mvd(&s, 47, lb + tb, ty);
                        fill_part(&c, sx, sy, pw, ph, refs[i],
                                  px + dx, py + dy);
                        for (int y = 0; y < ph; y++)
                            for (int x = 0; x < pw; x++) {
                                s.amvd[((sy + y) * c.w4 + sx + x) * 2] =
                                    (int16_t)(dx < 0 ? -dx : dx);
                                s.amvd[((sy + y) * c.w4 + sx + x) * 2 + 1] =
                                    (int16_t)(dy < 0 ? -dy : dy);
                            }
                    }
                }
            }
            if (dec) {
                for (int i = 0; i < 4; i++)
                    ref_out[mb * 4 + i] = (int8_t)refs[i];
                for (int y = 0; y < 4; y++)
                    for (int x = 0; x < 4; x++) {
                        mv_out[(mb * 16 + y * 4 + x) * 2] =
                            c.mvg[((y4 + y) * c.w4 + x4 + x) * 2];
                        mv_out[(mb * 16 + y * 4 + x) * 2 + 1] =
                            c.mvg[((y4 + y) * c.w4 + x4 + x) * 2 + 1];
                    }
            }
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++)
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
        } else if (kind == K_I8X8) {
            // Intra_8x8: 4 prediction modes with the same prev/rem
            // bins, predicted from the 4x4 mode grid (§8.3.2.1)
            for (int b8 = 0; b8 < 4; b8++) {
                int by = (b8 >> 1) * 2, bx = (b8 & 1) * 2;
                int gx = x4 + bx, gy = y4 + by;
                int8_t ma = gx > 0 ? c.i4g[gy * c.w4 + gx - 1] : -2;
                int8_t mbv = gy > 0 ? c.i4g[(gy - 1) * c.w4 + gx] : -2;
                int pred;
                if (ma == -2 || mbv == -2) pred = 2;
                else {
                    int a = ma < 0 ? 2 : ma, bb = mbv < 0 ? 2 : mbv;
                    pred = a < bb ? a : bb;
                }
                int emode = dec ? 0 : i4modes[mb * 16 + b8];
                int mode;
                if (cs_bin(&s, 68, emode == pred)) mode = pred;
                else {
                    int rv = emode < pred ? emode : emode - 1;
                    int b0 = cs_bin(&s, 69, rv & 1);
                    int b1 = cs_bin(&s, 69, (rv >> 1) & 1);
                    int b2 = cs_bin(&s, 69, (rv >> 2) & 1);
                    int rem = b0 | (b1 << 1) | (b2 << 2);
                    mode = rem < pred ? rem : rem + 1;
                }
                if (dec) i4modes[mb * 16 + b8] = (int8_t)mode;
                for (int y = 0; y < 2; y++)
                    for (int x = 0; x < 2; x++)
                        c.i4g[(gy + y) * c.w4 + gx + x] = (int8_t)mode;
            }
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++)
                    c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
        } else if (kind == K_I4X4) {
            // intra 4x4 pred modes
            for (int blk = 0; blk < 16; blk++) {
                int by = BLK4[blk][0], bx = BLK4[blk][1];
                int gx = x4 + bx, gy = y4 + by;
                int8_t ma = gx > 0 ? c.i4g[gy * c.w4 + gx - 1] : -2;
                int8_t mbv = gy > 0 ? c.i4g[(gy - 1) * c.w4 + gx] : -2;
                int pred;
                if (ma == -2 || mbv == -2) pred = 2;
                else {
                    int a = ma < 0 ? 2 : ma, bb = mbv < 0 ? 2 : mbv;
                    pred = a < bb ? a : bb;
                }
                int emode = dec ? 0 : i4modes[mb * 16 + by * 4 + bx];
                int mode;
                if (cs_bin(&s, 68, emode == pred)) mode = pred;
                else {
                    int rv = emode < pred ? emode : emode - 1;
                    int b0 = cs_bin(&s, 69, rv & 1);
                    int b1 = cs_bin(&s, 69, (rv >> 1) & 1);
                    int b2 = cs_bin(&s, 69, (rv >> 2) & 1);
                    int rem = b0 | (b1 << 1) | (b2 << 2);
                    mode = rem < pred ? rem : rem + 1;
                }
                if (dec) i4modes[mb * 16 + by * 4 + bx] = (int8_t)mode;
                c.i4g[gy * c.w4 + gx] = (int8_t)mode;
            }
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++)
                    c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
        }
        if (kind == K_I16)
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++) {
                    c.refg[(y4 + y) * c.w4 + x4 + x] = -1;
                    c.i4g[(y4 + y) * c.w4 + x4 + x] = -1;
                }
        if (is_b && kind >= K_I4X4)
            for (int y = 0; y < 4; y++)
                for (int x = 0; x < 4; x++)
                    c.refg1[(y4 + y) * c.w4 + x4 + x] = -1;

        // intra chroma pred mode (I_NxN + I16)
        if (kind == K_I4X4 || kind == K_I8X8 || kind == K_I16) {
            int na = nb_mb(&s, mb, -1, 0), nb2 = nb_mb(&s, mb, 0, -1);
            int ctx = (na >= 0 && s.cmode[na] != 0 ? 1 : 0)
                    + (nb2 >= 0 && s.cmode[nb2] != 0 ? 1 : 0);
            int ec = dec ? 0 : ((enc_info >> 4) & 15);
            if (!cs_bin(&s, 64 + ctx, ec != 0)) chroma_mode = 0;
            else if (!cs_bin(&s, 67, ec >= 2)) chroma_mode = 1;
            else chroma_mode = 2 + cs_bin(&s, 67, ec == 3);
        }

        // coded_block_pattern (inter + I4x4)
        if (kind != K_I16) {
            int ecbp = dec ? 0 : ((enc_info >> 8) & 63);
            int cbp_a = nb_cbpx(&s, mb, -1, 0, 0);
            int cbp_b = nb_cbpx(&s, mb, 0, -1, 0);
            // the reference uses 0x00F/0x7CF defaults for unavailable
            // in cbf ctx; for CBP ctx unavailable neighbors read as 0x0F
            int lcbp = 0;
            int ctx = !(cbp_a & 0x02) + 2 * !(cbp_b & 0x04);
            lcbp |= cs_bin(&s, 73 + ctx, ecbp & 1);
            ctx = !(lcbp & 0x01) + 2 * !(cbp_b & 0x08);
            lcbp |= cs_bin(&s, 73 + ctx, (ecbp >> 1) & 1) << 1;
            ctx = !(cbp_a & 0x08) + 2 * !(lcbp & 0x01);
            lcbp |= cs_bin(&s, 73 + ctx, (ecbp >> 2) & 1) << 2;
            ctx = !(lcbp & 0x04) + 2 * !(lcbp & 0x02);
            lcbp |= cs_bin(&s, 73 + ctx, (ecbp >> 3) & 1) << 3;
            int ca = (cbp_a >> 4) & 3, cb2 = (cbp_b >> 4) & 3;
            ctx = (ca > 0 ? 1 : 0) + (cb2 > 0 ? 2 : 0);
            int cc = 0;
            int ecc = (ecbp >> 4) & 3;
            if (cs_bin(&s, 77 + ctx, ecc != 0)) {
                ctx = 4 + (ca == 2 ? 1 : 0) + (cb2 == 2 ? 2 : 0);
                cc = 1 + cs_bin(&s, 77 + ctx, ecc == 2);
            }
            cbp = lcbp | (cc << 4);
        }

        int cbp_luma = cbp & 15;
        int cbp_chroma = (cbp >> 4) & 3;

        // inter transform_size_8x8_flag (after CBP; h264_cabac.c:2348)
        if (kind == K_INTER && transform_8x8_mode && cbp_luma
            && t8_ok) {
            int na = nb_mb(&s, mb, -1, 0), nb3 = nb_mb(&s, mb, 0, -1);
            int inc = (na >= 0 && s.t8f[na] ? 1 : 0)
                    + (nb3 >= 0 && s.t8f[nb3] ? 1 : 0);
            t8 = cs_bin(&s, 399 + inc,
                        dec ? 0 : ((enc_info & INFO_T8) != 0));
        }

        // mb_qp_delta
        if (kind == K_I16 || cbp != 0) {
            int edq = 0;
            if (!dec) {
                edq = qp_out[mb] - qp;
                if (edq < -26) edq += 52;
                if (edq > 25) edq -= 52;
            }
            int dq = cs_dqp(&s, edq);
            qp += dq;
            if (qp < 0) qp += 52;
            if (qp > 51) qp -= 52;
        } else {
            s.last_dqp = 0;
        }
        if (dec) qp_out[mb] = qp;

        // ---------------- residuals ----------------
        int16_t* mbco = coeffs + (size_t)mb * 27 * 16;
        int16_t* mbnc = ncoef + (size_t)mb * 27;
        const int intra = kind >= K_I4X4;
        uint16_t cpx = (uint16_t)cbp;

        if (kind == K_I16) {
            int ecbf = dec ? 0 : (mbnc[0] > 0 ? 1 : 0);
            if (cs_cbf(&s, 0, mb, 0, 0, 0, intra, ecbf)) {
                int t = cab_residual(&s, 0, mbco + 0, 0, 16);
                if (dec) mbnc[0] = (int16_t)t;
                cpx |= 0x100;
            }
        }
        if (t8) {
            // luma 8x8 groups as cat-5 residual blocks (64 zigzag
            // levels in rows 1+4g..4+4g); no coded_block_flag for
            // cat 5 in 4:2:0, and all four nnz cells carry the
            // group's coefficient count (h264_cabac.c:1715)
            for (int i8 = 0; i8 < 4; i8++) {
                int16_t* g64 = mbco + (size_t)(1 + 4 * i8) * 16;
                int t = 0;
                if ((cbp_luma >> i8) & 1)
                    t = cab_residual(&s, 5, g64, 0, 64);
                for (int i4 = 0; i4 < 4; i4++) {
                    int blk = 4 * i8 + i4;
                    int by = BLK4[blk][0], bx = BLK4[blk][1];
                    c.tcY[(y4 + by) * c.w4 + x4 + bx] = (int8_t)t;
                    if (dec) mbnc[1 + by * 4 + bx] = (int16_t)t;
                }
            }
        } else
        for (int blk = 0; blk < 16; blk++) {
            int by = BLK4[blk][0], bx = BLK4[blk][1];
            int gy = y4 + by, gx = x4 + bx;
            int i8 = blk >> 2;
            int present = kind == K_I16 ? (cbp_luma != 0)
                                        : ((cbp_luma >> i8) & 1);
            int16_t* outp = mbco + (size_t)(1 + by * 4 + bx) * 16;
            int t = 0;
            if (present) {
                int cat = kind == K_I16 ? 1 : 2;
                int nci = 1 + by * 4 + bx;
                int ecbf = dec ? 0 : (mbnc[nci] > 0 ? 1 : 0);
                if (cs_cbf(&s, cat, mb, gy, gx, 0, intra, ecbf)) {
                    if (kind == K_I16)
                        t = cab_residual(&s, 1, outp, 1, 15);
                    else
                        t = cab_residual(&s, 2, outp, 0, 16);
                }
                if (dec) mbnc[nci] = (int16_t)t;
                else t = mbnc[nci];
            }
            c.tcY[gy * c.w4 + gx] = (int8_t)t;
        }
        if (cbp_chroma) {
            for (int ch = 0; ch < 2; ch++) {
                int ecbf = dec ? 0 : (mbnc[17 + ch] > 0 ? 1 : 0);
                int t = 0;
                if (cs_cbf(&s, 3, mb, 0, 0, ch, intra, ecbf)) {
                    t = cab_residual(&s, 3, mbco + (size_t)(17 + ch) * 16,
                                     0, 4);
                    cpx |= 0x40 << ch;
                }
                if (dec) mbnc[17 + ch] = (int16_t)t;
            }
        }
        for (int ch = 0; ch < 2; ch++) {
            int8_t* tg = ch == 0 ? c.tcU : c.tcV;
            for (int blk = 0; blk < 4; blk++) {
                int by = blk >> 1, bx = blk & 1;
                int gy = my * 2 + by, gx = mx * 2 + bx;
                int t = 0;
                if (cbp_chroma == 2) {
                    int nci = 19 + ch * 4 + by * 2 + bx;
                    int ecbf = dec ? 0 : (mbnc[nci] > 0 ? 1 : 0);
                    if (cs_cbf(&s, 4, mb, gy, gx, ch, intra, ecbf)) {
                        int16_t* outp = mbco + (size_t)nci * 16;
                        t = cab_residual(&s, 4, outp, 1, 15);
                    }
                    if (dec) mbnc[nci] = (int16_t)t;
                    else t = mbnc[nci];
                }
                tg[gy * c.wc + gx] = (int8_t)t;
            }
        }

        if (dec) {
            mb_kind[mb] = kind;
            mb_info[mb] = imode16 | (chroma_mode << 4) | (cbp << 8)
                          | (t8 ? INFO_T8 : 0);
        }
        s.t8f[mb] = (int8_t)t8;
        s.cbpx[mb] = cpx;
        s.cmode[mb] = (int8_t)chroma_mode;
        s.itype[mb] = kind == K_I16 ? 2 : (kind == K_I4X4 ? 1 : 0);
        c.decoded[mb] = 1;
        if (dec && cd.error) CFAIL(-2);
        if (!dec && ce.overflow) CFAIL(-7);

        int eos = cs_term(&s, mb == nMB - 1);
        if (dec && eos) { mb++; goto finish; }
        if (!dec && mb == nMB - 1) goto finish_inc;
        }
    }
finish_inc:
    mb++;
finish:
    if (dec) {
        end_state[0] = cd.pos;
        end_state[1] = mb;
        if (cd.error) err = -2;
    } else {
        end_state[0] = (int32_t)ce.nbytes;
        end_state[1] = mb;
        if (ce.overflow) err = -7;
    }
done:
    free(c.tcY); free(c.tcU); free(c.tcV);
    free(c.mvg); free(c.refg); free(c.i4g); free(c.decoded);
    free(s.cbpx); free(s.skipf); free(s.cmode); free(s.itype); free(s.t8f);
    free(s.amvd); free(s.amvd1);
    free(c.mvg1); free(c.refg1);
    return err;
    #undef CFAIL
}

// ---------------------------------------------------------------------
// Sparse coefficient extraction for the device decode path.
//
// The device reconstruction uploads coefficients as a compact
// (flat_index, level) list scattered on device (decode_step.py); numpy
// flatnonzero over the dense [nMB*27*16] tensor costs ~16 ms per 1080p
// frame, so the scan lives here: ncoef (CAVLC/CABAC total_coeff per
// block) prunes all-zero blocks, making this a sub-millisecond pass.
// flat index = (mb*27 + blk)*16 + zigzag_pos, matching the dense
// layout documented above h264_decode_slice_cavlc.
// Returns the entry count, or -1 if cap would overflow.
extern "C" int h264_sparse_coeffs(
    const int16_t* coeffs, const int16_t* ncoef, int nMB,
    int32_t* idx_out, int16_t* val_out, int cap)
{
    int n = 0;
    for (int mb = 0; mb < nMB; mb++) {
        const int16_t* nc = ncoef + (size_t)mb * 27;
        for (int blk = 0; blk < 27; blk++) {
            if (!nc[blk]) continue;
            const int16_t* cf = coeffs + ((size_t)mb * 27 + blk) * 16;
            int base = (mb * 27 + blk) * 16;
            for (int k = 0; k < 16; k++) {
                if (!cf[k]) continue;
                if (n >= cap) return -1;
                idx_out[n] = base + k;
                val_out[n] = cf[k];
                n++;
            }
        }
    }
    return n;
}
