// hevc_tpu host entropy stage: CABAC + intra slice syntax (C++ fast path).
//
// Mirrors hevc_tpu/entropy/{cabac,syntax,tables}.py exactly -- the Python
// implementation is the behavioral spec and tests assert byte-identical
// output.  This is the sequential finalize stage that runs on host CPU while
// the TPU encodes the next frame (SURVEY.md section 7, 'CABAC throughput').
//
// Profile: CTB = CU = 16 (2Nx2N/NxN, TU16 luma + TU8 chroma), I/P/B
// slices (merge/AMVP/bi-pred syntax), SAO parameter coding.
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- spec tables (verified against libx265/libavcodec binaries) ----------
const uint8_t kRangeTabLps[64][4] = {
    {128,176,208,240},{128,167,197,227},{128,158,187,216},{123,150,178,205},
    {116,142,169,195},{111,135,160,185},{105,128,152,175},{100,122,144,166},
    {95,116,137,158},{90,110,130,150},{85,104,123,142},{81,99,117,135},
    {77,94,111,128},{73,89,105,122},{69,85,100,116},{66,80,95,110},
    {62,76,90,104},{59,72,86,99},{56,69,81,94},{53,65,77,89},
    {51,62,73,85},{48,59,69,80},{46,56,66,76},{43,53,63,72},
    {41,50,59,69},{39,48,56,65},{37,45,54,62},{35,43,51,59},
    {33,41,48,56},{32,39,46,53},{30,37,43,50},{29,35,41,48},
    {27,33,39,45},{26,31,37,43},{24,30,35,41},{23,28,33,39},
    {22,27,32,37},{21,26,30,35},{20,24,29,33},{19,23,27,31},
    {18,22,26,30},{17,21,25,28},{16,20,23,27},{15,19,22,25},
    {14,18,21,24},{14,17,20,23},{13,16,19,22},{12,15,18,21},
    {12,14,17,20},{11,14,16,19},{11,13,15,18},{10,12,15,17},
    {10,12,14,16},{9,11,13,15},{9,11,12,14},{8,10,12,14},
    {8,9,11,13},{7,9,11,12},{7,9,10,12},{7,8,10,11},
    {6,8,9,11},{6,7,9,10},{6,7,8,9},{2,2,2,2}};

const uint8_t kTransLps[64] = {
    0,0,1,2,2,4,4,5,6,7,8,9,9,11,11,12,13,13,15,15,16,16,18,18,19,19,21,21,
    22,22,23,24,24,25,26,26,27,27,28,29,29,30,30,30,31,32,32,33,33,33,34,34,
    35,35,35,36,36,36,37,37,37,38,38,63};

// context layout mirrors tables.py _reg() order
enum {
  CTX_SAO_MERGE = 0, CTX_SAO_TYPE = 1, CTX_SPLIT_CU = 2,
  CTX_TQ_BYPASS = 5, CTX_CU_SKIP = 6, CTX_QP_DELTA = 9, CTX_PRED_MODE = 12,
  CTX_PART_MODE = 13, CTX_PREV_INTRA = 17, CTX_CHROMA_MODE = 18,
  CTX_MERGE_FLAG = 20, CTX_MERGE_IDX = 21, CTX_INTER_PRED = 22,
  CTX_REF_IDX = 27, CTX_MVD = 31, CTX_MVP = 35, CTX_RQT_ROOT = 36,
  CTX_SPLIT_TR = 37, CTX_CBF_LUMA = 40, CTX_CBF_CHROMA = 42, CTX_TSKIP = 47,
  CTX_LAST_X = 53, CTX_LAST_Y = 71, CTX_CSBF = 89, CTX_SIG = 93,
  CTX_GT1 = 137, CTX_GT2 = 161, NUM_CTX = 179
};

const uint8_t kInit[3][NUM_CTX] = {
  {
    153, 200, 139, 141, 157, 154, 154, 154, 154, 154, 154, 154, 154, 184,
    154, 154, 154, 184, 63, 139, 154, 154, 154, 154, 154, 154, 154, 154,
    154, 154, 154, 154, 154, 154, 154, 154, 154, 153, 138, 138, 111, 141,
    94, 138, 182, 154, 154, 139, 139, 139, 139, 139, 139, 110, 110, 124,
    125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111, 79, 108, 123, 63,
    110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
    79, 108, 123, 63, 91, 171, 134, 141, 111, 111, 125, 110, 110, 94, 124,
    108, 124, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125,
    107, 125, 141, 179, 153, 125, 140, 139, 182, 182, 152, 136, 152, 136,
    153, 136, 139, 111, 136, 139, 111, 141, 111, 140, 92, 137, 138, 140,
    152, 138, 139, 153, 74, 149, 92, 139, 107, 122, 152, 140, 179, 166, 182,
    140, 227, 122, 197, 138, 153, 136, 167, 152, 152, 154, 154, 154, 154,
    154, 154, 154, 154, 154, 154, 154, 154},
  {
    153, 185, 107, 139, 126, 154, 197, 185, 201, 154, 154, 154, 149, 154,
    139, 154, 154, 154, 152, 139, 110, 122, 95, 79, 63, 31, 31, 153, 153,
    153, 153, 140, 198, 140, 198, 168, 79, 124, 138, 94, 153, 111, 149, 107,
    167, 154, 154, 139, 139, 139, 139, 139, 139, 125, 110, 94, 110, 95, 79,
    125, 111, 110, 78, 110, 111, 111, 95, 94, 108, 123, 108, 125, 110, 94,
    110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94, 108, 123, 108,
    121, 140, 61, 154, 155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183,
    140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136,
    153, 154, 170, 153, 123, 123, 107, 121, 107, 121, 167, 151, 183, 140,
    151, 183, 140, 140, 140, 154, 196, 196, 167, 154, 152, 167, 182, 182,
    134, 149, 136, 153, 121, 136, 137, 169, 194, 166, 167, 154, 167, 137,
    182, 107, 167, 91, 122, 107, 167, 154, 154, 154, 154, 154, 154, 154,
    154, 154, 154, 154, 154},
  {
    153, 160, 107, 139, 126, 154, 197, 185, 201, 154, 154, 154, 134, 154,
    139, 154, 154, 183, 152, 139, 154, 137, 95, 79, 63, 31, 31, 153, 153,
    153, 153, 169, 198, 169, 198, 168, 79, 224, 167, 122, 153, 111, 149, 92,
    167, 154, 154, 139, 139, 139, 139, 139, 139, 125, 110, 124, 110, 95, 94,
    125, 111, 111, 79, 125, 126, 111, 111, 79, 108, 123, 93, 125, 110, 124,
    110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111, 79, 108, 123, 93,
    121, 140, 61, 154, 170, 154, 139, 153, 139, 123, 123, 63, 124, 166, 183,
    140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136,
    153, 154, 170, 153, 138, 138, 122, 121, 122, 121, 167, 151, 183, 140,
    151, 183, 140, 140, 140, 154, 196, 167, 167, 154, 152, 167, 182, 182,
    134, 149, 136, 153, 121, 136, 122, 169, 208, 166, 167, 154, 152, 167,
    182, 107, 167, 91, 107, 107, 167, 154, 154, 154, 154, 154, 154, 154,
    154, 154, 154, 154, 154}};                         // gt2 (6)

const uint8_t kSigCtx4x4[16] = {0,1,4,5, 2,3,4,5, 6,6,8,8, 7,7,8,8};

struct Cabac {
  std::vector<uint8_t> bits;   // one bit per entry (kept simple; packed at end)
  int state[NUM_CTX];
  int mps[NUM_CTX];
  uint32_t low = 0, range = 510;
  int outstanding = 0;
  bool first = true;

  explicit Cabac(int qp, int init_type = 0) {
    bits.reserve(1 << 16);
    for (int i = 0; i < NUM_CTX; i++) {
      int iv = kInit[init_type][i];
      int slope = (iv >> 4) * 5 - 45;
      int off = ((iv & 15) << 3) - 16;
      int q = qp < 0 ? 0 : (qp > 51 ? 51 : qp);
      int pre = ((slope * q) >> 4) + off;
      pre = pre < 1 ? 1 : (pre > 126 ? 126 : pre);
      if (pre <= 63) { state[i] = 63 - pre; mps[i] = 0; }
      else { state[i] = pre - 64; mps[i] = 1; }
    }
  }
  inline void put(int b) {
    if (first) first = false; else bits.push_back((uint8_t)b);
    while (outstanding > 0) { bits.push_back((uint8_t)(1 - b)); outstanding--; }
  }
  inline void renorm() {
    while (range < 256) {
      if (low >= 512) { low -= 512; put(1); }
      else if (low < 256) put(0);
      else { low -= 256; outstanding++; }
      range <<= 1; low <<= 1;
    }
  }
  inline void bin(int ctx, int b) {
    int s = state[ctx];
    uint32_t lps = kRangeTabLps[s][(range >> 6) & 3];
    range -= lps;
    if (b != mps[ctx]) {
      low += range; range = lps;
      if (s == 0) mps[ctx] = 1 - mps[ctx];
      state[ctx] = kTransLps[s];
    } else {
      state[ctx] = s < 62 ? s + 1 : s;
    }
    renorm();
  }
  inline void bypass(int b) {
    low <<= 1;
    if (b) low += range;
    if (low >= 1024) { low -= 1024; put(1); }
    else if (low < 512) put(0);
    else { low -= 512; outstanding++; }
  }
  inline void bypass_bits(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) bypass((v >> i) & 1);
  }
  inline void terminate(int b) {
    range -= 2;
    if (b) {
      low += range; range = 2;
      renorm();
      put((low >> 9) & 1);
      bits.push_back((uint8_t)((low >> 8) & 1));
      bits.push_back(1);
    } else {
      renorm();
    }
  }
  long flush_to(uint8_t *out, long cap, bool alignment_one = false) {
    if (alignment_one) bits.push_back(1);
    size_t nbytes = (bits.size() + 7) / 8;
    if ((long)nbytes > cap) return -1;
    memset(out, 0, nbytes);
    for (size_t i = 0; i < bits.size(); i++)
      out[i >> 3] |= bits[i] << (7 - (i & 7));
    return (long)nbytes;
  }
};

// ---- scan orders -----------------------------------------------------------
struct Scans {
  // pos[scanIdx][log2-2][i] = {x, y}; hierarchical for n > 4
  std::vector<uint16_t> diag16, diag64, diag256;  // packed x | y<<8
  std::vector<uint16_t> flat[3][2];               // [scan][log2-2 (4,8 only)]

  static void flat_scan(int scan, int n, std::vector<uint16_t> &out) {
    out.clear();
    if (scan == 1) {               // horizontal
      for (int y = 0; y < n; y++)
        for (int x = 0; x < n; x++) out.push_back(x | (y << 8));
    } else if (scan == 2) {        // vertical
      for (int x = 0; x < n; x++)
        for (int y = 0; y < n; y++) out.push_back(x | (y << 8));
    } else {                       // up-right diagonal
      int x = 0, y = 0;
      while ((int)out.size() < n * n) {
        while (y >= 0) {
          if (x < n && y < n) out.push_back(x | (y << 8));
          y--; x++;
        }
        y = x; x = 0;
      }
    }
  }
  // hierarchical scan for TB size n (> 4): sub-blocks + inner 4x4
  static std::vector<uint16_t> hier(int scan, int n) {
    std::vector<uint16_t> sb, inner, out;
    flat_scan(scan, n >> 2, sb);
    flat_scan(scan, 4, inner);
    for (auto s : sb) {
      int xs = (s & 255) * 4, ys = (s >> 8) * 4;
      for (auto p : inner)
        out.push_back((xs + (p & 255)) | ((ys + (p >> 8)) << 8));
    }
    return out;
  }
};

int sig_ctx_inc(int log2, int scan, int xc, int yc, int cidx,
                int csbf_right, int csbf_below) {
  int sig;
  if (log2 == 2) sig = kSigCtx4x4[(yc << 2) | xc];
  else if (xc + yc == 0) sig = 0;
  else {
    int xp = xc & 3, yp = yc & 3;
    int prev = csbf_right + 2 * csbf_below;
    if (prev == 0) sig = (xp + yp == 0) ? 2 : (xp + yp < 3 ? 1 : 0);
    else if (prev == 1) sig = (yp == 0) ? 2 : (yp == 1 ? 1 : 0);
    else if (prev == 2) sig = (xp == 0) ? 2 : (xp == 1 ? 1 : 0);
    else sig = 2;
    if (cidx == 0) {
      if ((xc >> 2) + (yc >> 2) > 0) sig += 3;
      sig += (log2 == 3) ? (scan == 0 ? 9 : 15) : 21;
    } else {
      sig += (log2 == 3) ? 9 : 12;
    }
  }
  return cidx == 0 ? sig : 27 + sig;
}

int last_prefix_ctx(int log2, int cidx, int binIdx) {
  int off, shift;
  if (cidx == 0) { off = 3 * (log2 - 2) + ((log2 - 1) >> 2); shift = (log2 + 1) >> 2; }
  else { off = 15; shift = log2 - 2; }
  return (binIdx >> shift) + off;
}

int last_prefix(int coord) {
  if (coord <= 3) return coord;
  int bl = 32 - __builtin_clz((unsigned)coord);
  return 2 * (bl - 1) + (coord >= (3 << (bl - 2)) ? 1 : 0);
}

void encode_remaining(Cabac &c, int value, int rice) {
  if ((value >> rice) < 3) {
    int len = value >> rice;
    c.bypass_bits((1u << (len + 1)) - 2, len + 1);
    if (rice) c.bypass_bits(value & ((1 << rice) - 1), rice);
  } else {
    int len = rice;
    value -= 3 << rice;
    while (value >= (1 << len)) { value -= 1 << len; len++; }
    c.bypass_bits((1u << (3 + len + 1 - rice)) - 2, 3 + len + 1 - rice);
    if (len) c.bypass_bits((uint32_t)value, len);
  }
}

void encode_residual(Cabac &c, const int16_t *coeffs, int log2, int scan_idx,
                     int cidx, const std::vector<uint16_t> &scan,
                     const std::vector<uint16_t> &sb_scan, int sdh = 0) {
  int n = 1 << log2;
  int nn = n * n;
  int sbw = n > 4 ? (n >> 2) : 1;

  // values in scan order
  std::vector<int> vals(nn);
  int last_pos = -1;
  for (int i = 0; i < nn; i++) {
    int x = scan[i] & 255, y = scan[i] >> 8;
    vals[i] = coeffs[y * n + x];
    if (vals[i]) last_pos = i;
  }
  int last_x = scan[last_pos] & 255, last_y = scan[last_pos] >> 8;
  if (scan_idx == 2) { int t = last_x; last_x = last_y; last_y = t; }

  int gmax = (log2 << 1) - 1;
  int px = last_prefix(last_x), py = last_prefix(last_y);
  for (int b = 0; b < (px + 1 < gmax + 1 ? px + 1 : gmax); b++)
    c.bin(CTX_LAST_X + last_prefix_ctx(log2, cidx, b), b < px ? 1 : 0);
  for (int b = 0; b < (py + 1 < gmax + 1 ? py + 1 : gmax); b++)
    c.bin(CTX_LAST_Y + last_prefix_ctx(log2, cidx, b), b < py ? 1 : 0);
  if (px > 3) c.bypass_bits(last_x - ((2 + (px & 1)) << ((px >> 1) - 1)), (px >> 1) - 1);
  if (py > 3) c.bypass_bits(last_y - ((2 + (py & 1)) << ((py >> 1) - 1)), (py >> 1) - 1);

  int last_sb = last_pos >> 4;
  std::vector<uint8_t> sb_coded((nn >> 4) > 0 ? (nn >> 4) : 1, 0);
  for (int i = 0; i <= last_sb; i++)
    for (int k = 0; k < 16; k++)
      if (vals[i * 16 + k]) { sb_coded[i] = 1; break; }
  sb_coded[0] = 1; sb_coded[last_sb] = 1;

  std::vector<uint8_t> sb_pos(sbw * sbw, 0);
  if (n > 4)
    for (int i = 0; i < (nn >> 4); i++) {
      int xs = sb_scan[i] & 255, ys = sb_scan[i] >> 8;
      sb_pos[ys * sbw + xs] = sb_coded[i];
    }

  int c1 = 1;
  for (int i = last_sb; i >= 0; i--) {
    int xs = 0, ys = 0, cr_ = 0, cb_ = 0;
    if (n > 4) {
      xs = sb_scan[i] & 255; ys = sb_scan[i] >> 8;
      cr_ = (xs + 1 < sbw) ? sb_pos[ys * sbw + xs + 1] : 0;
      cb_ = (ys + 1 < sbw) ? sb_pos[(ys + 1) * sbw + xs] : 0;
    }
    bool infer_dc = false;
    if (i > 0 && i < last_sb) {
      int ctx = CTX_CSBF + (cidx ? 2 : 0) + ((cr_ + cb_) ? 1 : 0);
      c.bin(ctx, sb_coded[i]);
      infer_dc = true;
    }
    if (!sb_coded[i]) continue;

    int sig_pos[16]; int nsig = 0;
    int start = (i == last_sb) ? (last_pos & 15) - 1 : 15;
    if (i == last_sb) sig_pos[nsig++] = last_pos & 15;
    for (int ns = start; ns >= 0; ns--) {
      int v = vals[i * 16 + ns];
      if (ns > 0 || !infer_dc) {
        int gp = i * 16 + ns;
        int xc = scan[gp] & 255, yc = scan[gp] >> 8;
        int ctx = sig_ctx_inc(log2, scan_idx, xc, yc, cidx, cr_, cb_);
        c.bin(CTX_SIG + ctx, v != 0);
        if (v) infer_dc = false;
      }
      if (v || (ns == 0 && infer_dc)) sig_pos[nsig++] = ns;
    }
    if (!nsig) continue;

    int abs_v[16], sign_v[16];
    for (int k = 0; k < nsig; k++) {
      int v = vals[i * 16 + sig_pos[k]];
      abs_v[k] = v < 0 ? -v : v;
      sign_v[k] = v < 0;
    }
    int ctx_set = ((i > 0 && cidx == 0) ? 2 : 0) + (c1 == 0 ? 1 : 0);
    c1 = 1;
    int g1_base = CTX_GT1 + (cidx ? 16 : 0) + 4 * ctx_set;
    int first_g1 = -1;
    int ng1 = nsig < 8 ? nsig : 8;
    for (int k = 0; k < ng1; k++) {
      int g1 = abs_v[k] > 1;
      c.bin(g1_base + c1, g1);
      if (g1) { c1 = 0; if (first_g1 < 0) first_g1 = k; }
      else if (c1 > 0 && c1 < 3) c1++;
    }
    if (first_g1 >= 0)
      c.bin(CTX_GT2 + (cidx ? 4 : 0) + ctx_set, abs_v[first_g1] > 2);
    // sign-data hiding: the firstSigScanPos sign (last of this
    // reverse-scan list) is inferred from the level-sum parity when the
    // sub-block's significant span exceeds 3 (the quantizer fix-up
    // guarantees the parity matches; mirror of entropy/syntax.py)
    int hide = (sdh && sig_pos[0] - sig_pos[nsig - 1] > 3) ? 1 : 0;
    for (int k = 0; k < nsig - hide; k++) c.bypass(sign_v[k]);

    int rice = 0, first2 = 1;
    for (int k = 0; k < nsig; k++) {
      int base = (k < 8) ? (2 + first2) : 1;
      if (abs_v[k] >= base) {
        encode_remaining(c, abs_v[k] - base, rice);
        if (abs_v[k] > (3 << rice) && rice < 4) rice++;
      }
      if (abs_v[k] >= 2) first2 = 0;
    }
  }
}

}  // namespace

extern "C" long hevc_entropy_encode_tile_v0(
    int qp, int nh, int nw, int last_tile, const int32_t *modes,
    const uint8_t *cbf_y, const uint8_t *cbf_cb, const uint8_t *cbf_cr,
    const int16_t *lvl_y, const int16_t *lvl_cb, const int16_t *lvl_cr,
    int sdh, uint8_t *out, long cap) {
  Cabac c(qp);
  std::vector<uint16_t> scan_y[3], scan_c[3], sb_y, sb_c1;
  for (int s = 0; s < 3; s++) {
    scan_y[s] = Scans::hier(s, 16);
    scan_c[s] = Scans::hier(s, 8);
  }
  std::vector<uint16_t> sby[3], sbc[3];
  for (int s = 0; s < 3; s++) {
    Scans::flat_scan(s, 4, sby[s]);
    Scans::flat_scan(s, 2, sbc[s]);
  }

  for (int cy = 0; cy < nh; cy++) {
    for (int cx = 0; cx < nw; cx++) {
      int idx = cy * nw + cx;
      int mode = modes[idx];
      int cand_a = cx > 0 ? modes[idx - 1] : 1;
      int c0 = cand_a, cc1, cc2;
      // mpm list (mirror of entropy.syntax.mpm_candidates with cand_b = DC)
      int list[3];
      if (cand_a == 1) { list[0] = 0; list[1] = 1; list[2] = 26; }
      else if (cand_a == 0) { list[0] = 0; list[1] = 1; list[2] = 26; }
      else { list[0] = cand_a; list[1] = 1; list[2] = 0; }
      (void)c0; (void)cc1; (void)cc2;

      c.bin(CTX_PART_MODE, 1);            // PART_2Nx2N
      int in_list = -1;
      for (int k = 0; k < 3; k++) if (list[k] == mode) { in_list = k; break; }
      if (in_list >= 0) {
        c.bin(CTX_PREV_INTRA, 1);
        c.bypass(in_list == 0 ? 0 : 1);
        if (in_list > 0) c.bypass(in_list - 1);
      } else {
        c.bin(CTX_PREV_INTRA, 0);
        int rem = mode;
        for (int k = 0; k < 3; k++) if (list[k] < mode) rem--;
        c.bypass_bits((uint32_t)rem, 5);
      }
      c.bin(CTX_CHROMA_MODE, 0);          // DM

      int fy = cbf_y[idx], fcb = cbf_cb[idx], fcr = cbf_cr[idx];
      c.bin(CTX_CBF_CHROMA + 0, fcb);
      c.bin(CTX_CBF_CHROMA + 0, fcr);
      c.bin(CTX_CBF_LUMA + 1, fy);
      // v0: TB16 luma / TB8 chroma always use diagonal scan
      if (fy)
        encode_residual(c, lvl_y + (long)idx * 256, 4, 0, 0, scan_y[0],
                        sby[0], sdh);
      if (fcb)
        encode_residual(c, lvl_cb + (long)idx * 64, 3, 0, 1, scan_c[0],
                        sbc[0], sdh);
      if (fcr)
        encode_residual(c, lvl_cr + (long)idx * 64, 3, 0, 2, scan_c[0],
                        sbc[0], sdh);
      bool last_ctu = (cy == nh - 1 && cx == nw - 1);
      c.terminate((last_ctu && last_tile) ? 1 : 0);
    }
  }
  if (!last_tile) {
    // end_of_subset_one_bit: the flush's trailing '1' doubles as the
    // byte_alignment bit; zero padding only.
    c.terminate(1);
  }
  return c.flush_to(out, cap);
}

extern "C" long hevc_entropy_encode_slice_v0(
    int qp, int nh, int nw, const int32_t *modes,
    const uint8_t *cbf_y, const uint8_t *cbf_cb, const uint8_t *cbf_cr,
    const int16_t *lvl_y, const int16_t *lvl_cb, const int16_t *lvl_cr,
    int sdh, uint8_t *out, long cap) {
  return hevc_entropy_encode_tile_v0(qp, nh, nw, 1, modes, cbf_y, cbf_cb,
                                     cbf_cr, lvl_y, lvl_cb, lvl_cr, sdh,
                                     out, cap);
}

// ---- v1 profile: 2Nx2N / NxN intra CUs ------------------------------------

namespace {

void mpm_list(int a, int b, int out[3]) {
  if (a == b) {
    if (a < 2) { out[0] = 0; out[1] = 1; out[2] = 26; }
    else { out[0] = a; out[1] = 2 + ((a + 29) % 32); out[2] = 2 + ((a - 1) % 32); }
    return;
  }
  out[0] = a; out[1] = b;
  out[2] = (a != 0 && b != 0) ? 0 : ((a != 1 && b != 1) ? 1 : 26);
}

void nxn_mpm(int i, const int *modes_sofar, int left_tr, int left_br,
             int left_avail, int out[3]) {
  int a, b;
  if (i == 0) { a = left_avail ? left_tr : 1; b = 1; }
  else if (i == 1) { a = modes_sofar[0]; b = 1; }
  else if (i == 2) { a = left_avail ? left_br : 1; b = modes_sofar[0]; }
  else { a = modes_sofar[2]; b = modes_sofar[1]; }
  mpm_list(a, b, out);
}

int intra_scan_idx(int log2, int mode, int cidx) {
  if (log2 == 2 || (log2 == 3 && cidx == 0)) {
    if (mode >= 6 && mode <= 14) return 2;
    if (mode >= 22 && mode <= 30) return 1;
  }
  return 0;
}

void encode_luma_mode(Cabac &c, int mode, const int cands[3]) {
  int idx = -1;
  for (int k = 0; k < 3; k++) if (cands[k] == mode) { idx = k; break; }
  if (idx >= 0) {
    c.bin(CTX_PREV_INTRA, 1);
    c.bypass(idx == 0 ? 0 : 1);
    if (idx > 0) c.bypass(idx - 1);
  } else {
    c.bin(CTX_PREV_INTRA, 0);
    int rem = mode;
    for (int k = 0; k < 3; k++) if (cands[k] < mode) rem--;
    c.bypass_bits((uint32_t)rem, 5);
  }
}

}  // namespace

namespace {

// SAO syntax (spec 7.3.8.3): this encoder never uses merge (flags coded 0).
void encode_sao_offsets(Cabac &c, const int8_t *off, int band, int cmax) {
  for (int i = 0; i < 4; i++) {
    int a = off[i] < 0 ? -off[i] : off[i];
    int nb = a < cmax ? a + 1 : cmax;
    for (int k = 0; k < nb; k++) c.bypass(k < a ? 1 : 0);
  }
  if (band)
    for (int i = 0; i < 4; i++)
      if (off[i]) c.bypass(off[i] < 0 ? 1 : 0);
}

void encode_sao_ctu(Cabac &c, int bit_depth, int left_avail, int up_avail,
                    int ty_y, int aux_y, const int8_t *off_y,
                    int ty_c, int cls_c, int pos_cb, int pos_cr,
                    const int8_t *off_cb, const int8_t *off_cr) {
  int bd = bit_depth < 10 ? bit_depth : 10;
  int cmax = (1 << (bd - 5)) - 1;
  if (left_avail) c.bin(CTX_SAO_MERGE, 0);
  if (up_avail) c.bin(CTX_SAO_MERGE, 0);
  if (ty_y == 0) {
    c.bin(CTX_SAO_TYPE, 0);
  } else {
    c.bin(CTX_SAO_TYPE, 1);
    c.bypass(ty_y == 2 ? 1 : 0);
    encode_sao_offsets(c, off_y, ty_y == 1, cmax);
    c.bypass_bits((uint32_t)aux_y, ty_y == 1 ? 5 : 2);
  }
  if (ty_c == 0) {
    c.bin(CTX_SAO_TYPE, 0);
  } else {
    c.bin(CTX_SAO_TYPE, 1);
    c.bypass(ty_c == 2 ? 1 : 0);
    encode_sao_offsets(c, off_cb, ty_c == 1, cmax);
    c.bypass_bits((uint32_t)(ty_c == 1 ? pos_cb : cls_c),
                  ty_c == 1 ? 5 : 2);
    encode_sao_offsets(c, off_cr, ty_c == 1, cmax);
    if (ty_c == 1) c.bypass_bits((uint32_t)pos_cr, 5);
  }
}

void encode_eg1(Cabac &c, uint32_t v) {
  // 1st-order exp-Golomb bypass (abs_mvd_minus2)
  int len = 1;
  while (v >= (1u << len)) {
    c.bypass(1);
    v -= 1u << len;
    len++;
  }
  c.bypass(0);
  c.bypass_bits(v, len);
}
}  // namespace

extern "C" long hevc_entropy_encode_tile_v1(
    int qp, int nh, int nw, int last_tile, int p_slice, const uint8_t *skip,
    const uint8_t *inter, const uint8_t *merge, const int16_t *mvd,
    const uint8_t *mvp, const uint8_t *rqt, const uint8_t *cbf_yi,
    const uint8_t *cbf_cbi, const uint8_t *cbf_cri,
    int bit_depth, const int8_t *sao,   // 18 x int8 per CTU (see binding)
    int b_slice, const uint8_t *dir, const int16_t *mvd1, const uint8_t *mvp1,
    const uint8_t *part, const int32_t *modes4,
    const uint8_t *cbf_y4, const uint8_t *cbf_cb, const uint8_t *cbf_cr,
    const uint8_t *cbf_cb4, const uint8_t *cbf_cr4,
    const int16_t *lvl_y, const int16_t *lvl_cb, const int16_t *lvl_cr,
    int sdh, uint8_t *out, long cap) {
  Cabac c(qp, p_slice ? (b_slice ? 2 : 1) : 0);
  std::vector<uint8_t> above_skip(nw, 0);
  std::vector<uint16_t> scan16[3], scan8[3], scan4[3];
  std::vector<uint16_t> sb16[3], sb8[3], sb4[3];
  for (int s = 0; s < 3; s++) {
    scan16[s] = Scans::hier(s, 16);
    scan8[s] = Scans::hier(s, 8);
    Scans::flat_scan(s, 4, scan4[s]);
    Scans::flat_scan(s, 4, sb16[s]);
    Scans::flat_scan(s, 2, sb8[s]);
    Scans::flat_scan(s, 1, sb4[s]);
  }
  std::vector<int> left_tr(1, 1), left_br(1, 1);

  // temp buffers for 8x8 / 4x4 sub-blocks
  int16_t tmp8[64], tmp4[16];

  for (int cy = 0; cy < nh; cy++) {
    int ltr = 1, lbr = 1;   // left CTU's (top-right, bottom-right) modes
    int left_skip = 0;
    for (int cx = 0; cx < nw; cx++) {
      long idx = (long)cy * nw + cx;
      const int32_t *m4 = modes4 + idx * 4;
      if (sao) {
        const int8_t *s = sao + idx * 18;
        encode_sao_ctu(c, bit_depth, cx > 0, cy > 0,
                       s[0], s[1], s + 2, s[6], s[7], s[8], s[9],
                       s + 10, s + 14);
      }
      int sk = (p_slice && skip) ? skip[idx] : 0;
      if (p_slice) {
        c.bin(CTX_CU_SKIP + (cx > 0 ? left_skip : 0) +
                  (cy > 0 ? above_skip[cx] : 0),
              sk);
        if (sk) {
          ltr = lbr = 1;    // non-intra neighbor -> DC for MPM purposes
          left_skip = 1;
          above_skip[cx] = 1;
          bool last_ctu0 = (cy == nh - 1 && cx == nw - 1);
          c.terminate((last_ctu0 && last_tile) ? 1 : 0);
          continue;
        }
        if (inter && inter[idx]) {
          // non-skip inter CU: PART_2Nx2N, single ref, optional residual
          c.bin(CTX_PRED_MODE, 0);
          c.bin(CTX_PART_MODE, 1);
          int mrg = merge[idx];
          c.bin(CTX_MERGE_FLAG, mrg);
          int rqt_f = 1;
          if (!mrg) {
            int dr = (b_slice && dir) ? dir[idx] : 0;
            if (b_slice) {
              // inter_pred_idc (2Nx2N at depth 0): bin0 'bi?' ctx 0,
              // if uni: bin1 'l1?' ctx 4
              c.bin(CTX_INTER_PRED + 0, dr == 2 ? 1 : 0);
              if (dr != 2) c.bin(CTX_INTER_PRED + 4, dr);
            }
            auto code_mvd = [&](int mx, int my) {
              int ax = mx < 0 ? -mx : mx, ay = my < 0 ? -my : my;
              c.bin(CTX_MVD, ax ? 1 : 0);
              c.bin(CTX_MVD, ay ? 1 : 0);
              if (ax) c.bin(CTX_MVD + 1, ax > 1 ? 1 : 0);
              if (ay) c.bin(CTX_MVD + 1, ay > 1 ? 1 : 0);
              if (ax > 1) encode_eg1(c, (uint32_t)(ax - 2));
              if (ax) c.bypass(mx < 0 ? 1 : 0);
              if (ay > 1) encode_eg1(c, (uint32_t)(ay - 2));
              if (ay) c.bypass(my < 0 ? 1 : 0);
            };
            if (dr == 0 || dr == 2) {
              code_mvd(mvd[idx * 2], mvd[idx * 2 + 1]);
              c.bin(CTX_MVP, mvp[idx]);
            }
            if (dr == 1 || dr == 2) {
              code_mvd(mvd1[idx * 2], mvd1[idx * 2 + 1]);
              c.bin(CTX_MVP, mvp1[idx]);
            }
            rqt_f = rqt[idx];
            c.bin(CTX_RQT_ROOT, rqt_f);
          }
          if (rqt_f) {
            int fy = cbf_yi[idx], fcb = cbf_cbi[idx], fcr = cbf_cri[idx];
            c.bin(CTX_CBF_CHROMA + 0, fcb);
            c.bin(CTX_CBF_CHROMA + 0, fcr);
            if (fcb || fcr) c.bin(CTX_CBF_LUMA + 1, fy);
            if (fy)
              encode_residual(c, lvl_y + idx * 256, 4, 0, 0, scan16[0],
                              sb16[0], sdh);
            if (fcb)
              encode_residual(c, lvl_cb + idx * 64, 3, 0, 1, scan8[0],
                              sb8[0], sdh);
            if (fcr)
              encode_residual(c, lvl_cr + idx * 64, 3, 0, 2, scan8[0],
                              sb8[0], sdh);
          }
          ltr = lbr = 1;
          left_skip = 0;
          above_skip[cx] = 0;
          bool last_ctu1 = (cy == nh - 1 && cx == nw - 1);
          c.terminate((last_ctu1 && last_tile) ? 1 : 0);
          continue;
        }
        c.bin(CTX_PRED_MODE, 1);   // pred_mode_flag = MODE_INTRA
        left_skip = 0;
        above_skip[cx] = 0;
      }
      int nxn = part[idx];
      c.bin(CTX_PART_MODE, nxn ? 0 : 1);

      if (!nxn) {
        int mode = m4[0];
        int cands[3];
        mpm_list(cx > 0 ? ltr : 1, 1, cands);
        encode_luma_mode(c, mode, cands);
        c.bin(CTX_CHROMA_MODE, 0);
        int fcb = cbf_cb[idx], fcr = cbf_cr[idx], fy = cbf_y4[idx * 4];
        c.bin(CTX_CBF_CHROMA + 0, fcb);
        c.bin(CTX_CBF_CHROMA + 0, fcr);
        c.bin(CTX_CBF_LUMA + 1, fy);
        if (fy) {
          int s = intra_scan_idx(4, mode, 0);
          encode_residual(c, lvl_y + idx * 256, 4, s, 0, scan16[s], sb16[s], sdh);
        }
        if (fcb) {
          int s = intra_scan_idx(3, mode, 1);
          encode_residual(c, lvl_cb + idx * 64, 3, s, 1, scan8[s], sb8[s], sdh);
        }
        if (fcr) {
          int s = intra_scan_idx(3, mode, 1);
          encode_residual(c, lvl_cr + idx * 64, 3, s, 2, scan8[s], sb8[s], sdh);
        }
        ltr = lbr = mode;
      } else {
        // NxN: grouped prev flags then mpm data
        int cands[4][3];
        int sofar[4];
        for (int i = 0; i < 4; i++) {
          nxn_mpm(i, sofar, ltr, lbr, cx > 0, cands[i]);
          sofar[i] = m4[i];
        }
        int flags[4];
        for (int i = 0; i < 4; i++) {
          flags[i] = 0;
          for (int k = 0; k < 3; k++) if (cands[i][k] == m4[i]) flags[i] = 1;
          c.bin(CTX_PREV_INTRA, flags[i]);
        }
        for (int i = 0; i < 4; i++) {
          if (flags[i]) {
            int id = 0;
            for (int k = 0; k < 3; k++) if (cands[i][k] == m4[i]) { id = k; break; }
            c.bypass(id == 0 ? 0 : 1);
            if (id > 0) c.bypass(id - 1);
          } else {
            int rem = m4[i];
            for (int k = 0; k < 3; k++) if (cands[i][k] < m4[i]) rem--;
            c.bypass_bits((uint32_t)rem, 5);
          }
        }
        c.bin(CTX_CHROMA_MODE, 0);
        int chroma_mode = m4[0];
        int pcb = cbf_cb[idx], pcr = cbf_cr[idx];
        c.bin(CTX_CBF_CHROMA + 0, pcb);
        c.bin(CTX_CBF_CHROMA + 0, pcr);
        for (int i = 0; i < 4; i++) {
          int dx = (i & 1) * 8, dy = (i >> 1) * 8;
          int fcb_i = pcb ? cbf_cb4[idx * 4 + i] : 0;
          int fcr_i = pcr ? cbf_cr4[idx * 4 + i] : 0;
          if (pcb) c.bin(CTX_CBF_CHROMA + 1, fcb_i);
          if (pcr) c.bin(CTX_CBF_CHROMA + 1, fcr_i);
          int fy = cbf_y4[idx * 4 + i];
          c.bin(CTX_CBF_LUMA + 0, fy);
          if (fy) {
            for (int r2 = 0; r2 < 8; r2++)
              for (int x2 = 0; x2 < 8; x2++)
                tmp8[r2 * 8 + x2] = lvl_y[idx * 256 + (dy + r2) * 16 + dx + x2];
            int s = intra_scan_idx(3, m4[i], 0);
            encode_residual(c, tmp8, 3, s, 0, scan8[s], sb8[s], sdh);
          }
          int cdx = (i & 1) * 4, cdy = (i >> 1) * 4;
          if (fcb_i) {
            for (int r2 = 0; r2 < 4; r2++)
              for (int x2 = 0; x2 < 4; x2++)
                tmp4[r2 * 4 + x2] = lvl_cb[idx * 64 + (cdy + r2) * 8 + cdx + x2];
            int s = intra_scan_idx(2, chroma_mode, 1);
            encode_residual(c, tmp4, 2, s, 1, scan4[s], sb4[s], sdh);
          }
          if (fcr_i) {
            for (int r2 = 0; r2 < 4; r2++)
              for (int x2 = 0; x2 < 4; x2++)
                tmp4[r2 * 4 + x2] = lvl_cr[idx * 64 + (cdy + r2) * 8 + cdx + x2];
            int s = intra_scan_idx(2, chroma_mode, 1);
            encode_residual(c, tmp4, 2, s, 2, scan4[s], sb4[s], sdh);
          }
        }
        ltr = m4[1];
        lbr = m4[3];
      }
      bool last_ctu = (cy == nh - 1 && cx == nw - 1);
      c.terminate((last_ctu && last_tile) ? 1 : 0);
    }
  }
  if (!last_tile) c.terminate(1);
  return c.flush_to(out, cap);
}

// ---- ctb32 profile: two-level coding quadtree (32 -> 4x16) ----------------
//
// Mirrors hevc_tpu/entropy/ctb32.py exactly (the Python module is the
// behavioral spec; tests assert byte-identical output).  CTB 32 / min CB
// 16 / max TB 16: split CTBs use the CU16 toolset (2Nx2N intra + inter
// skip/merge/explicit, no PART_NxN) in z-order; unsplit CTBs carry one
// 32x32 CU whose transform tree is forced to four TU16 quadrants.

extern "C" long hevc_entropy_encode_tile_ctb32(
    int qp, int th32, int tw32, int last_tile, int p_slice, int b_slice,
    int bit_depth,
    const uint8_t *skip, const uint8_t *inter, const uint8_t *merge,
    const int16_t *mvd, const uint8_t *mvp, const uint8_t *rqt,
    const uint8_t *cbf_yi, const uint8_t *cbf_cbi, const uint8_t *cbf_cri,
    const uint8_t *dir, const int16_t *mvd1, const uint8_t *mvp1,
    const int32_t *modes4, const uint8_t *cbf_y4,
    const uint8_t *cbf_cb, const uint8_t *cbf_cr,
    const int16_t *lvl_y, const int16_t *lvl_cb, const int16_t *lvl_cr,
    const uint8_t *split32, const uint8_t *skip32, const uint8_t *inter32,
    const uint8_t *merge32, const int32_t *dir32,
    const int16_t *mvd32, const uint8_t *mvp32,
    const int16_t *mvd32_1, const uint8_t *mvp32_1, const uint8_t *rqt32,
    const int32_t *mode32, const uint8_t *cbf32_cb, const uint8_t *cbf32_cr,
    const int8_t *sao,   // 18 x int8 per CTB32 (or null; see binding)
    int sdh,
    // merge_idx support (MaxNumMergeCand > 1): per-cell / per-CTB32
    // selected candidate index; null pointers mean all-zero
    const uint8_t *midx, const uint8_t *midx32, int max_merge,
    uint8_t *out, long cap) {
  Cabac c(qp, p_slice ? (b_slice ? 2 : 1) : 0);
  int nh = 2 * th32, nw = 2 * tw32;
  std::vector<int> modes16((size_t)nh * nw, -1);
  std::vector<uint8_t> skip16((size_t)nh * nw, 0);
  std::vector<uint8_t> depth16((size_t)nh * nw, 0);
  std::vector<uint16_t> scan16[3], scan8[3];
  std::vector<uint16_t> sb16[3], sb8[3];
  for (int s = 0; s < 3; s++) {
    scan16[s] = Scans::hier(s, 16);
    scan8[s] = Scans::hier(s, 8);
    Scans::flat_scan(s, 4, sb16[s]);
    Scans::flat_scan(s, 2, sb8[s]);
  }

  auto code_midx = [&](int mi) {
    // TR binarization cMax = max_merge-1: first bin ctx, rest bypass
    if (max_merge <= 1) return;
    c.bin(CTX_MERGE_IDX, mi > 0 ? 1 : 0);
    int lim = mi + 1 < max_merge - 1 ? mi + 1 : max_merge - 1;
    for (int k = 1; k < lim; k++) c.bypass(mi == k ? 0 : 1);
  };

  auto code_mvd = [&](int mx, int my) {
    int ax = mx < 0 ? -mx : mx, ay = my < 0 ? -my : my;
    c.bin(CTX_MVD, ax ? 1 : 0);
    c.bin(CTX_MVD, ay ? 1 : 0);
    if (ax) c.bin(CTX_MVD + 1, ax > 1 ? 1 : 0);
    if (ay) c.bin(CTX_MVD + 1, ay > 1 ? 1 : 0);
    if (ax > 1) encode_eg1(c, (uint32_t)(ax - 2));
    if (ax) c.bypass(mx < 0 ? 1 : 0);
    if (ay > 1) encode_eg1(c, (uint32_t)(ay - 2));
    if (ay) c.bypass(my < 0 ? 1 : 0);
  };

  // returns rqt flag
  auto inter_pu = [&](int mrg, int dr, int mx0, int my0, int mp0,
                      int mx1, int my1, int mp1, int rq, int depth,
                      int mi) -> int {
    if (mrg) { c.bin(CTX_MERGE_FLAG, 1); code_midx(mi); return 1; }
    c.bin(CTX_MERGE_FLAG, 0);
    if (b_slice) {
      c.bin(CTX_INTER_PRED + depth, dr == 2 ? 1 : 0);
      if (dr != 2) c.bin(CTX_INTER_PRED + 4, dr);
    }
    if (dr == 0 || dr == 2) { code_mvd(mx0, my0); c.bin(CTX_MVP, mp0); }
    if (dr == 1 || dr == 2) { code_mvd(mx1, my1); c.bin(CTX_MVP, mp1); }
    c.bin(CTX_RQT_ROOT, rq);
    return rq;
  };

  int16_t tmp8[64];
  // TU16 luma + TU8 chroma residual block of one 16-cell
  auto tu16_cell = [&](long idx, int mode, int pcb, int pcr, int depth) {
    int fy = cbf_y4[idx * 4];
    int fcb = cbf_cb[idx], fcr = cbf_cr[idx];
    if (depth == 0) {
      c.bin(CTX_CBF_CHROMA + 0, fcb);
      c.bin(CTX_CBF_CHROMA + 0, fcr);
      c.bin(CTX_CBF_LUMA + 1, fy);
    } else {
      if (pcb) c.bin(CTX_CBF_CHROMA + 1, fcb);
      if (pcr) c.bin(CTX_CBF_CHROMA + 1, fcr);
      c.bin(CTX_CBF_LUMA + 0, fy);
    }
    if (fy) {
      int s = mode < 0 ? 0 : intra_scan_idx(4, mode, 0);
      encode_residual(c, lvl_y + idx * 256, 4, s, 0, scan16[s], sb16[s], sdh);
    }
    if (fcb && (depth == 0 || pcb)) {
      int s = mode < 0 ? 0 : intra_scan_idx(3, mode, 1);
      encode_residual(c, lvl_cb + idx * 64, 3, s, 1, scan8[s], sb8[s], sdh);
    }
    if (fcr && (depth == 0 || pcr)) {
      int s = mode < 0 ? 0 : intra_scan_idx(3, mode, 1);
      encode_residual(c, lvl_cr + idx * 64, 3, s, 2, scan8[s], sb8[s], sdh);
    }
  };
  (void)tmp8;

  for (int cy32 = 0; cy32 < th32; cy32++) {
    for (int cx32 = 0; cx32 < tw32; cx32++) {
      long i32 = (long)cy32 * tw32 + cx32;
      if (sao) {
        const int8_t *s = sao + i32 * 18;
        encode_sao_ctu(c, bit_depth, cx32 > 0, cy32 > 0, s[0], s[1], s + 2,
                       s[6], s[7], s[8], s[9], s + 10, s + 14);
      }
      int cy = 2 * cy32, cx = 2 * cx32;
      int ctx = 0;
      if (cx > 0 && depth16[(size_t)cy * nw + cx - 1] > 0) ctx++;
      if (cy > 0 && depth16[(size_t)(cy - 1) * nw + cx] > 0) ctx++;
      int sp = split32[i32];
      c.bin(CTX_SPLIT_CU + ctx, sp);
      if (sp) {
        for (int q = 0; q < 4; q++) {
          int qy = q >> 1, qx = q & 1;
          int ry = cy + qy, rx = cx + qx;
          long idx = (long)ry * nw + rx;
          depth16[idx] = 1;
          if (p_slice) {
            int sk = skip[idx];
            int l = rx > 0 ? skip16[(size_t)ry * nw + rx - 1] : 0;
            int a = ry > 0 ? skip16[(size_t)(ry - 1) * nw + rx] : 0;
            c.bin(CTX_CU_SKIP + l + a, sk);
            skip16[idx] = (uint8_t)sk;
            if (sk) { code_midx(midx ? midx[idx] : 0); continue; }
            if (inter[idx]) {
              c.bin(CTX_PRED_MODE, 0);
              c.bin(CTX_PART_MODE, 1);
              int rq = inter_pu(merge[idx],
                                b_slice ? dir[idx] : 0,
                                mvd[idx * 2], mvd[idx * 2 + 1], mvp[idx],
                                b_slice ? mvd1[idx * 2] : 0,
                                b_slice ? mvd1[idx * 2 + 1] : 0,
                                b_slice ? mvp1[idx] : 0,
                                rqt[idx], 1, midx ? midx[idx] : 0);
              if (rq) {
                int fy = cbf_yi[idx], fcb = cbf_cbi[idx], fcr = cbf_cri[idx];
                c.bin(CTX_CBF_CHROMA + 0, fcb);
                c.bin(CTX_CBF_CHROMA + 0, fcr);
                if (fcb || fcr) c.bin(CTX_CBF_LUMA + 1, fy);
                if (fy)
                  encode_residual(c, lvl_y + idx * 256, 4, 0, 0, scan16[0],
                                  sb16[0], sdh);
                if (fcb)
                  encode_residual(c, lvl_cb + idx * 64, 3, 0, 1, scan8[0],
                                  sb8[0], sdh);
                if (fcr)
                  encode_residual(c, lvl_cr + idx * 64, 3, 0, 2, scan8[0],
                                  sb8[0], sdh);
              }
              continue;
            }
            c.bin(CTX_PRED_MODE, 1);
          }
          int mode = modes4[idx * 4];
          c.bin(CTX_PART_MODE, 1);           // 2Nx2N (16 == min CB)
          int a = 1, b = 1;
          if (rx > 0 && modes16[(size_t)ry * nw + rx - 1] >= 0)
            a = modes16[(size_t)ry * nw + rx - 1];
          if ((ry & 1) && modes16[(size_t)(ry - 1) * nw + rx] >= 0)
            b = modes16[(size_t)(ry - 1) * nw + rx];
          int cands[3];
          mpm_list(a, b, cands);
          encode_luma_mode(c, mode, cands);
          c.bin(CTX_CHROMA_MODE, 0);
          modes16[idx] = mode;
          tu16_cell(idx, mode, 0, 0, 0);
        }
      } else {
        long idx0 = (long)cy * nw + cx;
        depth16[idx0] = 0;
        depth16[idx0 + 1] = 0;
        depth16[idx0 + nw] = 0;
        depth16[idx0 + nw + 1] = 0;
        int is_intra32 = 1;
        if (p_slice) {
          int sk = skip32[i32];
          int l = cx > 0 ? skip16[(size_t)cy * nw + cx - 1] : 0;
          int a = cy > 0 ? skip16[(size_t)(cy - 1) * nw + cx] : 0;
          c.bin(CTX_CU_SKIP + l + a, sk);
          skip16[idx0] = skip16[idx0 + 1] = skip16[idx0 + nw] =
              skip16[idx0 + nw + 1] = (uint8_t)sk;
          if (sk) { code_midx(midx32 ? midx32[i32] : 0); goto ctb_done; }
          if (inter32[i32]) {
            is_intra32 = 0;
            c.bin(CTX_PRED_MODE, 0);
            c.bin(CTX_PART_MODE, 1);
            int rq = inter_pu(merge32[i32],
                              b_slice ? dir32[i32] : 0,
                              mvd32[i32 * 2], mvd32[i32 * 2 + 1],
                              mvp32[i32],
                              b_slice ? mvd32_1[i32 * 2] : 0,
                              b_slice ? mvd32_1[i32 * 2 + 1] : 0,
                              b_slice ? mvp32_1[i32] : 0,
                              rqt32[i32], 0,
                              midx32 ? midx32[i32] : 0);
            if (!rq) goto ctb_done;
          } else {
            c.bin(CTX_PRED_MODE, 1);
          }
        }
        {
          int m32 = -1;
          if (is_intra32) {
            m32 = mode32[i32];
            // 32 > min CB: part_mode absent (inferred 2Nx2N)
            int a = 1;
            if (cx > 0 && modes16[(size_t)cy * nw + cx - 1] >= 0)
              a = modes16[(size_t)cy * nw + cx - 1];
            int cands[3];
            mpm_list(a, 1, cands);
            encode_luma_mode(c, m32, cands);
            c.bin(CTX_CHROMA_MODE, 0);
            modes16[idx0] = modes16[idx0 + 1] = modes16[idx0 + nw] =
                modes16[idx0 + nw + 1] = m32;
          }
          // forced-split transform tree: parent chroma cbfs at depth 0
          int pcb = cbf32_cb[i32], pcr = cbf32_cr[i32];
          c.bin(CTX_CBF_CHROMA + 0, pcb);
          c.bin(CTX_CBF_CHROMA + 0, pcr);
          for (int q = 0; q < 4; q++) {
            long idx = (long)(cy + (q >> 1)) * nw + cx + (q & 1);
            tu16_cell(idx, m32, pcb, pcr, 1);
          }
        }
      ctb_done:;
      }
      bool last_ctu = (cy32 == th32 - 1 && cx32 == tw32 - 1);
      c.terminate((last_ctu && last_tile) ? 1 : 0);
    }
  }
  if (!last_tile) c.terminate(1);
  return c.flush_to(out, cap);
}
