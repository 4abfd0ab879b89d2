// Native host classify engine for desamba_tpu.
//
// A C++ port of the Python oracle (desamba_tpu/oracle/*), NOT of the
// reference C code: same exact semantics (validated against the committed
// goldens through the ctypes binding), structured as a batch engine with a
// worker pool (the kt_for analog) and index views over numpy-owned arrays.
// Comparator tie behavior matches the reference because we call the same
// glibc qsort on same-size elements.
//
// Build: make -C native   ->  libdesamba_host.so   (ctypes, no pybind11)
//
// Reference citations (file:line into /root/reference) mark which behavior
// each section reproduces; the implementation derives from the Python
// oracle in this repository.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ----------------------------------------------------------------- index --
struct IndexView {
  // FM
  const uint8_t* codes;     // padded code stream (pad nibbles included)
  const int64_t* cum;       // [6][cum_stride] prefix counts, row-major
  int64_t cum_stride;       // row width (codes_len + 1)
  int64_t L;                // valid rows
  int64_t codes_len;        // padded length
  const int64_t* rank;      // [6]
  const int64_t* hash13;    // [2^26+1]
  const uint32_t* sa_uni;
  const uint32_t* sa_off;
  int64_t dollar_pos;
  // unitigs / refs
  const int64_t* uni_len;     // [N+2] (real N, dummy, load-extra)
  const int64_t* reflist;     // [N+2]
  int64_t n_unitig;           // N (real)
  const int64_t* refpos_global;
  const int32_t* refpos_refid;
  int64_t n_refpos;
  const int64_t* ref_offset;  // [n_ref]
  const int64_t* ref_len;     // [n_ref]
  const uint8_t* ref_bin;     // packed 2-bit
  int64_t ref_total;          // bases
  // exist filter
  const uint8_t* ek0;
  const uint8_t* ek1;
  uint64_t ek_mask;
  int ek_len;
  int ek_single_base_max;
  // scoring
  const int32_t* q_mem;               // [2000]
  const int32_t* q_lv;                // [20][20]
  int32_t filter_min_length;
  int32_t filter_min_score;
  int32_t filter_min_score_lv3;
};

static inline int64_t occ(const IndexView& ix, int64_t r, int c) {
  return ix.cum[(int64_t)c * ix.cum_stride + r];
}

static inline int QLV(const IndexView& ix, int ed, int len) {
  return ix.q_lv[ed * 20 + len];
}

// get_ref (cly.c:434-461); out-of-range -> 255 (unmatchable)
static void get_ref(const IndexView& ix, uint8_t* out, int64_t offset,
                    int64_t length, bool forward) {
  for (int64_t k = 0; k < length; k++) {
    int64_t idx = forward ? offset + k : offset - k;
    if (idx < 0 || idx >= ix.ref_total) {
      out[k] = 255;
      continue;
    }
    uint8_t byte = ix.ref_bin[idx >> 2];
    out[k] = (byte >> (6 - ((idx & 3) << 1))) & 3;
  }
}

// ------------------------------------------------------------------ hashes --
static inline uint64_t hash64_1(uint64_t key) {  // lib/utils.c:1067
  key = (~key) + (key << 21);
  key = key ^ (key >> 24);
  key = (key + (key << 3)) + (key << 8);
  key = key ^ (key >> 14);
  key = (key + (key << 2)) + (key << 4);
  key = key ^ (key >> 28);
  key = key + (key << 31);
  return key;
}
static inline uint64_t hash64_2(uint64_t key) {  // lib/utils.c:1080
  key += ~(key << 32);
  key ^= (key >> 22);
  key += ~(key << 13);
  key ^= (key >> 8);
  key += (key << 3);
  key ^= (key >> 15);
  key += ~(key << 27);
  key ^= (key >> 31);
  return key;
}

// ------------------------------------------------------------------- LV ----
// Banded Landau-Vishkin extend (cly.c:505-604) with virtual sentinels;
// out-of-buffer reads model the reference's adjacent-garbage as no-match.
static int lv_extd(const uint8_t* ref, int ref_length, int ref_buf_len,
                   const uint8_t* query, int query_length, int query_buf_len) {
  if (ref_length < query_length) {
    std::swap(ref, query);
    std::swap(ref_length, query_length);
    std::swap(ref_buf_len, query_buf_len);
  }
  int mn[16], ed[16];
  auto MN = [&](int j) -> int& { return mn[j + 6]; };
  auto ED = [&](int j) -> int& { return ed[j + 6]; };
  for (int i = -5; i <= 6; i++) {
    MN(i) = -1;
    ED(i) = i > 0 ? i : -i;
  }
  int best = query_length;
  auto rc = [&](int k) -> int {
    if (k == ref_length) return 35;
    if (k >= 0 && k < ref_length) return k < ref_buf_len ? ref[k] : -1;
    return -1;
  };
  auto qc = [&](int k) -> int {
    if (k == query_length) return 36;
    if (k >= 0 && k < query_length) return k < query_buf_len ? query[k] : -2;
    return -2;
  };
  for (int i = 0; i <= 4; i++) {
    int prev_mn = -1, cur_mn = i - 1, next_mn = MN(-i + 1);
    int prev_ed = i + 1, cur_ed = i, next_ed = ED(-i + 1);
    for (int j = -i; j <= 4; j++) {
      if (cur_mn + j < ref_length - 1) {
        int mx = cur_mn + 1 - cur_ed;
        MN(j) = cur_mn + 1;
        ED(j) = cur_ed + 1;
        if (mx < next_mn + 1 - next_ed) {
          MN(j) = next_mn + 1;
          ED(j) = next_ed + 1;
          mx = next_mn - next_ed;
        }
        if (mx < prev_mn - prev_ed) {
          MN(j) = prev_mn + 1;
          ED(j) = prev_ed + 1;
        }
      } else {
        int mx = cur_mn - cur_ed;
        MN(j) = cur_mn;
        ED(j) = cur_ed + 1;
        if (mx < prev_mn - prev_ed) {
          MN(j) = prev_mn;
          ED(j) = prev_ed + 1;
          mx = prev_mn - prev_ed;
        }
        if (mx < next_mn + 1 - next_ed) {
          MN(j) = next_mn + 1;
          ED(j) = next_ed + 1;
        }
      }
      int mn_j = std::min(MN(j), std::min(query_length, ref_length - j));
      while (rc(mn_j + j) == qc(mn_j)) mn_j++;
      MN(j) = mn_j;
      if (qc(mn_j) == 36 || rc(mn_j + j) == 35) {
        best = std::min(ED(j) - 1, best);
        if (j <= i + 1) return best;
      }
      prev_mn = cur_mn;
      cur_mn = next_mn;
      next_mn = MN(j + 2);
      prev_ed = cur_ed;
      cur_ed = next_ed;
      next_ed = ED(j + 2);
    }
  }
  return best;
}

// -------------------------------------------------------------- sp_set ----
struct SpSet {  // cly.c:1276-1293
  std::vector<int64_t> v;
  void reset() { v.clear(); }
  bool insert(int64_t node) {
    if (v.size() == 500) v.clear();
    for (int64_t x : v)
      if (x == node) return false;
    v.push_back(node);
    return true;
  }
};

// ------------------------------------------------------------ structures --
struct AnchorC {  // mirrors Anchor (cly.h:44-61); keep sizeof == 56
  uint16_t mtch_len;
  int16_t score;
  uint8_t left_len, left_ED, rigt_len, rigt_ED;
  uint8_t direction;
  uint64_t global_offset;
  uint32_t ref_ID;
  uint32_t ref_offset;
  uint32_t index_in_read;
  void* chain_anchor_pre;
  uint16_t seed_ID;
  uint16_t chain_id;
  uint8_t anchor_useless;
  uint8_t duplicate;
};
static_assert(sizeof(AnchorC) == 56, "AnchorC must match reference size");

struct ChainC {  // chain_item (cly.h:69-89); sizeof == 56
  uint32_t ref_ID;
  int32_t q_t_dis;
  uint32_t sum_score;
  uint32_t anchor_number;
  uint8_t direction, with_top_anchor, primary, pri_index;
  uint32_t t_st, t_ed, q_st, q_ed;
  uint32_t indel;
  uint32_t chain_id;
  AnchorC* chain_anchor_cur;
};
static_assert(sizeof(ChainC) == 56, "ChainC must match reference size");

struct MemRstC {  // MEM_rst (cly.c:614-622); sizeof == 40
  int match_len;
  uint64_t sp;
  uint64_t sa_sp;
  int sa_sp_l;
  int kmer_index;
  int read_offset;
};
static_assert(sizeof(MemRstC) == 40, "MemRstC must match reference size");

struct Seed {
  uint32_t offset, len;
  uint8_t top;
};

struct SearchDirC {
  std::vector<Seed> seeds;
  const uint8_t* bin_read;  // into bin2
  std::vector<uint64_t> kmers;
  int direction;  // 1 = FORWARD
  uint32_t total_score;
};

struct SpdMatch {  // spd_match (cly.h:127-133)
  uint32_t t_pos, q_pos;
  int32_t len;
  int32_t score;
};

struct ReadResultC {
  std::vector<ChainC> hits;
  std::vector<AnchorC> anchors;
  bool fast_classify = true;
};

// worker-persistent buffer (Classify_buff_pool analog)
struct Buff {
  int max_read_l = 0;
  int64_t m_bin_read = 0;  // BUFF_REALLOC state for the heap-prepad model
  std::vector<uint8_t> bin2;  // [8 prepad][F][R][slack]
};
// ------------------------------------------------------------- islands ----
// store_kmers (cly.c:359-397): rolling e-kmers with low-complexity zeroing
static void store_kmers(const uint8_t* bin_read, int n_kmer, int lek,
                        int single_base_max, uint64_t* out) {
  int counts[4] = {0, 0, 0, 0};
  for (int i = 0; i < lek; i++) counts[bin_read[i]]++;
  uint64_t mask = (lek >= 32) ? ~0ull : ((1ull << (2 * lek)) - 1);
  uint64_t kmer = 0;
  for (int i = 0; i < lek - 1; i++) kmer = (kmer << 2) | bin_read[i];
  for (int i = 0; i < n_kmer; i++) {
    if (i > 0) {
      counts[bin_read[i - 1]]--;
      counts[bin_read[i + lek - 1]]++;
    }
    bool failed = counts[0] >= single_base_max || counts[1] >= single_base_max ||
                  counts[2] >= single_base_max || counts[3] >= single_base_max;
    kmer = ((kmer << 2) | bin_read[i + lek - 1]) & mask;
    out[i] = failed ? 0 : kmer;
  }
}

// get_exist_kmer (cly.c:951-967)
static inline int exist_probe1(const IndexView& ix, uint64_t kmer) {
  if (kmer == 0) return 0;
  uint64_t h1 = hash64_1(kmer) & ix.ek_mask;
  if (!((ix.ek0[h1 >> 3] >> (7 - (h1 & 7))) & 1)) return 0;
  uint64_t h2 = hash64_2(kmer) & ix.ek_mask;
  return (ix.ek1[h2 >> 3] >> (7 - (h2 & 7))) & 1;
}

// search_exist_kmer_M2 (cly.c:1066-1155); exists may be precomputed (device)
static void find_islands(const uint8_t* exists, int n, int direction,
                         std::vector<Seed>& seeds) {
  seeds.clear();
  if (direction == 1) {  // FORWARD
    for (int i = 2; i < n; i += 3) {
      if (exists[i]) {
        int offset = i, len = 1;
        for (int j = 1; j < 3; j++) {
          if (exists[i - j]) {
            offset--;
            len++;
          } else
            break;
        }
        for (int j = 1; i + j < n; j++) {
          if (exists[i + j]) {
            len++;
            if (len > 60) break;
          } else
            break;
        }
        seeds.push_back({(uint32_t)offset, (uint32_t)len, 0});
        i = offset + len;
      }
    }
  } else {
    for (int i = n - 3; i >= 0; i -= 3) {
      if (exists[i]) {
        int offset = i, len = 1;
        for (int j = 1; j < 3; j++) {
          if (i + j < n && exists[i + j]) {
            offset++;
            len++;
          } else
            break;
        }
        for (int j = 1; j <= i; j++) {
          if (exists[i - j]) {
            len++;
            if (len > 60) break;
          } else
            break;
        }
        seeds.push_back({(uint32_t)(offset - len + 1), (uint32_t)len, 0});
        i = offset - len;
      }
    }
  }
}

// get_seed_vector_M2 top marking + direction score (cly.c:1157-1229)
static void build_search_dir(const IndexView& ix, const uint8_t* bin_read,
                             int n_kmer, int direction, SearchDirC& sd) {
  sd.bin_read = bin_read;
  sd.direction = direction;
  sd.kmers.resize(n_kmer);
  store_kmers(bin_read, n_kmer, ix.ek_len, ix.ek_single_base_max,
              sd.kmers.data());
  std::vector<uint8_t> exists(n_kmer);
  for (int i = 0; i < n_kmer; i++)
    exists[i] = (uint8_t)exist_probe1(ix, sd.kmers[i]);
  find_islands(exists.data(), n_kmer, direction, sd.seeds);
  uint32_t total_score = 0;
  int max_index = 0;
  uint32_t max_length = 0, index_end = 100;
  auto& seeds = sd.seeds;
  if (!seeds.empty()) {
    for (size_t m = 0; m < seeds.size(); m++) {
      seeds[m].top = 0;
      uint32_t posk = direction == 1
                          ? seeds[m].offset
                          : (uint32_t)(n_kmer - seeds[m].offset - seeds[m].len);
      if (posk < index_end) {
        if (max_length < seeds[m].len) {
          max_length = seeds[m].len;
          max_index = (int)m;
        }
        seeds[max_index].top = 0;
      } else {
        seeds[max_index].top = 1;
        index_end += 100;
        total_score += max_length;
        max_index = (int)m;
        max_length = seeds[m].len;
      }
    }
    seeds[max_index].top = 1;
    total_score += max_length;
  }
  sd.total_score = total_score;
}

// ----------------------------------------------------------- FM search ----
// bwt_single_search (cly.c:1339-1378); bin2 has valid range [0, bin_len)
static void bwt_single_search(const IndexView& ix, int64_t sp, int64_t spos,
                              const uint8_t* bin2, int64_t bin_len,
                              int max_match_len, SpSet& sp_set, MemRstC& m,
                              bool* ab) {
  int64_t sa_sp = -1;
  int sa_sp_l = 0, match_len = 0;
  while (true) {
    if (match_len >= max_match_len) break;
    if ((sp & 7) == 0) {
      sa_sp = sp;
      sa_sp_l = 0;
    } else
      sa_sp_l--;
    int c = ix.codes[sp];
    int64_t v;
    if (c == 5)
      v = ix.dollar_pos;
    else if (c > 5) {
      *ab = true;  // pad nibble: the reference xassert-aborts (bwt.c:53)
      return;
    } else
      v = occ(ix, sp, c);
    int64_t new_sp = v + ix.rank[c];
    int want = (spos >= 0 && spos < bin_len) ? bin2[spos] : -1;
    if (c != want) break;
    match_len++;
    spos--;
    if (!sp_set.insert(new_sp)) {
      m.match_len = -1000;
      return;
    }
    sp = new_sp;
  }
  m.sp = (uint64_t)sp;
  m.match_len = match_len;
  m.sa_sp = (uint64_t)sa_sp;
  m.sa_sp_l = sa_sp_l;
}

// bwt_MEM_search (cly.c:1383-1442)
static int bwt_mem_search(const IndexView& ix, const uint8_t* bin2,
                          int64_t bin_len, int64_t s_idx, uint32_t pre_v,
                          int max_rst, int l_min, int64_t l_max, SpSet& sp_set,
                          std::vector<MemRstC>& out, bool* ab) {
  int64_t sp = ix.hash13[pre_v], ep = ix.hash13[pre_v + 1];
  int64_t ptr = s_idx - 13;
  int64_t match_len = 13;
  int64_t new_sp = 0, new_ep = 0;
  while (true) {
    int c = (ptr >= 0 && ptr < bin_len) ? bin2[ptr] : 255;
    ptr--;
    if (c > 5) {
      new_sp = 0;
      new_ep = 0;
    } else {
      new_sp = ix.rank[c] + occ(ix, sp, c);
      new_ep = ix.rank[c] + occ(ix, ep, c);
    }
    if (match_len >= l_min - 1) {
      if (new_sp + max_rst >= new_ep) break;
      if (match_len >= l_max) return 0;
    }
    if (new_sp + 1 >= new_ep) break;
    match_len++;
    sp = new_sp;
    ep = new_ep;
  }
  if (new_sp >= new_ep) return 0;
  size_t n0 = out.size();
  if (new_sp + 1 == new_ep) {
    if (!sp_set.insert(new_sp)) return 0;
    MemRstC m{};
    bwt_single_search(ix, new_sp, ptr, bin2, bin_len,
                      (int)std::max((int64_t)0, l_max - match_len), sp_set, m,
                      ab);
    if (*ab) return 0;
    m.match_len += (int)match_len + 1;
    if (m.match_len >= l_min) out.push_back(m);
  } else {
    for (int64_t c_sp = new_sp; c_sp < new_ep; c_sp++) {
      if (!sp_set.insert(c_sp)) continue;
      MemRstC m{};
      bwt_single_search(ix, c_sp, ptr, bin2, bin_len,
                        (int)std::max((int64_t)0, l_max - match_len), sp_set, m,
                        ab);
      if (*ab) return 0;
      m.match_len += (int)match_len + 1;
      if (m.match_len >= l_min) out.push_back(m);
    }
  }
  return (int)(out.size() - n0);
}
// ------------------------------------------------------------- map_seed ----
// get_uni (cly.c:466-491)
static int64_t get_uni(const IndexView& ix, int64_t bwt_pos, int search_l,
                       int64_t* global_off, uint32_t* uni_off, bool* ab) {
  int64_t s = bwt_pos >> 3;
  int64_t uni_id = ix.sa_uni[s];
  uint32_t uo = (uint32_t)(ix.sa_off[s] + search_l + 1);
  if (search_l > 0) {
    while (uo >= (uint32_t)ix.uni_len[uni_id]) {
      uo -= (uint32_t)ix.uni_len[uni_id] + 1;
      uni_id++;
      if (uni_id > ix.n_unitig) {  // walked past the dummy unitig
        *ab = true;
        return 0;
      }
    }
  }
  *global_off = ix.refpos_global[ix.reflist[uni_id]] + uo;
  *uni_off = uo;
  return uni_id;
}

// get_new_ed (cly.c:624-689)
static void get_new_ed(const IndexView& ix, uint32_t* e_d, uint32_t* len_,
                       uint32_t* l_mem_ext, int32_t q_off, int64_t t_off,
                       uint32_t l_read, const uint8_t* q_b, bool is_fwd) {
  uint8_t qb[13], tb[13];
  int32_t max_len, len;
  int64_t qpos = 0;
  if (is_fwd) {
    if (q_off < 0) q_off = 0;
    max_len = q_off;
    len = std::min(12, max_len);
    for (int k = 0; k < len; k++) qb[k] = q_b[q_off - k];
  } else {
    max_len = (int32_t)(l_read - q_off);
    len = std::min(12, max_len);
    qpos = q_off;
    for (int k = 0; k < len; k++) qb[k] = q_b[qpos + k];
  }
  get_ref(ix, tb, t_off, len, !is_fwd);
  if (len > 0 && tb[0] == qb[0]) {
    while (true) {
      int mtc = 0;
      while (mtc < len && tb[mtc] == qb[mtc]) mtc++;
      if (mtc == 0) break;
      *l_mem_ext += mtc;
      max_len -= mtc;
      len = std::min(12, max_len);
      if (is_fwd) {
        q_off -= mtc;
        t_off -= mtc;
        for (int k = 0; k < len; k++) qb[k] = q_b[q_off - k];
      } else {
        t_off += mtc;
        qpos += mtc;
        for (int k = 0; k < len; k++) qb[k] = q_b[qpos + k];
      }
      get_ref(ix, tb, t_off, len, !is_fwd);
    }
  }
  *e_d = (uint32_t)lv_extd(tb, len, 13, qb, len, 13);
  *len_ = (uint32_t)len;
}

// map_seed (cly.c:701-934). q_b points at the direction's read codes.
static int map_seed(const IndexView& ix, MemRstC& m, const uint8_t* q_b,
                    uint32_t read_len, uint16_t seed_id, uint8_t direction,
                    std::vector<AnchorC>& anchors, bool* ab) {
  int64_t b_p = (int64_t)m.sp;
  int32_t q_off = m.read_offset;
  uint32_t l_m = (uint32_t)m.match_len;
  int64_t uni = -1;
  uint32_t u_off = 0;
  int64_t t_off = 0;
  uint32_t l_pre = 0, l_suf = 0, d_pre = 0, d_suf = 0;
  int s = 0, max_s = 0;
  bool fail = false;
  do {
    l_pre = (uint32_t)std::min(q_off + 1, 12);
    uint8_t q_pre[13], t_pre[13];
    int q_pre_n = (int)l_pre;
    for (uint32_t k = 0; k < l_pre; k++) q_pre[k] = q_b[q_off - k];
    int s_l = 0;
    if (m.sa_sp != (uint64_t)-1) {
      uni = get_uni(ix, (int64_t)m.sa_sp, m.sa_sp_l, &t_off, &u_off, ab);
      if (*ab) { fail = true; break; }
    } else {
      while (true) {
        if ((b_p & 7) == 0) break;
        int c = ix.codes[b_p];
        if (c > 5) { *ab = true; fail = true; break; }  // reference aborts
        int64_t v = (c == 5) ? ix.dollar_pos : occ(ix, b_p, c);
        int64_t new_sp = v + ix.rank[c];
        if (c == 4) break;
        if (s_l < 13) t_pre[s_l] = (uint8_t)c;
        s_l++;
        b_p = new_sp;
        if (s_l >= (int)l_pre) break;
      }
      if (fail) break;
      if ((b_p & 7) == 0) {
        uni = get_uni(ix, b_p, s_l, &t_off, &u_off, ab);
        if (*ab) { fail = true; break; }
      } else
        l_pre = (uint32_t)s_l;
    }
    if (uni >= 0) {
      if (ix.uni_len[uni] < 35) break;  // MIN_UNI_L
      l_pre = std::min(l_pre, u_off);
      get_ref(ix, t_pre, t_off - 1, l_pre, false);
    }
    d_pre = (uint32_t)lv_extd(t_pre, (int)l_pre, 13, q_pre, (int)l_pre, q_pre_n);
    s = ix.q_mem[std::min<uint32_t>(l_m, 1999)] + QLV(ix, d_pre, l_pre);
    if (s < 12 && l_pre == 12 && uni < 0) {  // MIN_S_1
      s = 0;
      break;
    }
    if (uni < 0) {
      while (b_p & 7) {
        int c = ix.codes[b_p];
        if (c > 5) { *ab = true; fail = true; break; }
        int64_t v = (c == 5) ? ix.dollar_pos : occ(ix, b_p, c);
        b_p = v + ix.rank[c];
        s_l++;
      }
      if (fail) break;
      uni = get_uni(ix, b_p, s_l, &t_off, &u_off, ab);
      if (*ab) { fail = true; break; }
      if (ix.uni_len[uni] < 35) {
        s = 0;
        break;
      }
    }
    int32_t q_off_r = q_off + (int32_t)l_m + 1;
    uint32_t l_max_suf =
        std::min((uint32_t)(ix.uni_len[uni] - u_off - l_m),
                 (uint32_t)(read_len - q_off_r));
    if (l_max_suf != 0) {
      l_suf = std::min(l_max_suf, 12u);
      int64_t qpos = q_off_r;
      uint8_t t_suf[13];
      get_ref(ix, t_suf, t_off + l_m, l_suf, true);
      // q_suf may run past read_len into the other strand's bytes in the
      // reference buffer; our bin2 is also contiguous so this is defined
      if (l_suf > 0 && t_suf[0] == q_b[qpos]) {
        while (true) {
          int mtc = 0;
          while (mtc < (int)l_suf && t_suf[mtc] == q_b[qpos + mtc]) mtc++;
          if (mtc == 0) break;
          l_m += mtc;
          s = ix.q_mem[std::min<uint32_t>(l_m, 1999)] + QLV(ix, d_pre, l_pre);
          l_max_suf -= mtc;
          l_suf = std::min(l_max_suf, 12u);
          qpos += mtc;
          get_ref(ix, t_suf, t_off + l_m, l_suf, true);
        }
      }
      d_suf = (uint32_t)lv_extd(t_suf, (int)l_suf, 13, q_b + qpos, (int)l_suf,
                                (int)l_suf);
      s += QLV(ix, d_suf, l_suf);
    } else {
      l_suf = d_suf = 0;
    }
    if (s <= 20 && l_suf == 12) {  // MIN_S_2
      s = 0;
      break;
    }
  } while (false);

  if (s > 0 && !fail) {
    uint32_t am_mtch = l_m;
    int am_score = s;
    uint32_t am_ll = l_pre, am_le = d_pre, am_rl = l_suf, am_re = d_suf;
    int64_t rp_s = ix.reflist[uni], rp_e = ix.reflist[uni + 1];
    bool ref_search_l = (l_pre < 12 || d_pre == 0);
    bool ref_search_r = (l_suf < 12 || d_suf == 0);
    if (rp_e - rp_s > 50) {
      if (rp_e - rp_s >= 1000) return 50;
    }
    for (int64_t rp = rp_s; rp < rp_e; rp++) {
      int64_t g = ix.refpos_global[rp];
      uint32_t a_ll = am_ll, a_le = am_le, a_rl = am_rl, a_re = am_re;
      uint32_t a_mtch = am_mtch;
      int a_score = am_score;
      uint32_t l_m_ext_l = 0;
      if (ref_search_l || ref_search_r) {
        if (ref_search_l) {
          uint32_t ed_l, len_l;
          get_new_ed(ix, &ed_l, &len_l, &l_m_ext_l, q_off, g + u_off - 1,
                     read_len, q_b, true);
          a_ll = len_l;
          a_le = ed_l;
        }
        a_mtch = l_m + l_m_ext_l;
        if (ref_search_r) {
          uint32_t ed_r, len_r, l_m_ext_r = 0;
          get_new_ed(ix, &ed_r, &len_r, &l_m_ext_r, q_off + (int32_t)l_m + 1,
                     g + u_off + l_m, read_len, q_b, false);
          a_rl = len_r;
          a_re = ed_r;
          a_mtch += l_m_ext_r;
        }
        a_score = ix.q_mem[std::min<uint32_t>(a_mtch, 1999)] +
                  QLV(ix, a_le, a_ll) + QLV(ix, a_re, a_rl);
        if (a_score < 20) continue;  // MIN_S_2
      }
      max_s = std::max(max_s, a_score);
      AnchorC a{};
      a.mtch_len = (uint16_t)a_mtch;
      a.score = (int16_t)a_score;
      a.left_len = (uint8_t)a_ll;
      a.left_ED = (uint8_t)a_le;
      a.rigt_len = (uint8_t)a_rl;
      a.rigt_ED = (uint8_t)a_re;
      a.direction = direction;
      a.index_in_read = (uint32_t)(q_off + 1 - (int32_t)l_m_ext_l);
      a.global_offset = (uint64_t)(g + u_off - l_m_ext_l);
      a.ref_ID = (uint32_t)ix.refpos_refid[rp];
      a.ref_offset = (uint32_t)(a.global_offset - ix.ref_offset[a.ref_ID]);
      a.seed_ID = seed_id;
      a.duplicate = 0;
      anchors.push_back(a);
    }
  }
  return max_s;
}
// ------------------------------------------------------------- chaining ----
static inline int32_t i32u(uint32_t v) { return (int32_t)v; }
static inline uint32_t absu(uint32_t a, uint32_t b) {
  return a > b ? a - b : b - a;
}

// chain_insert_meta (cly.c:71-111)
static void chain_insert_meta(AnchorC* a, ChainC* c, bool new_chain,
                              int dis_minus) {
  uint32_t ref_l = a->ref_offset;
  uint32_t ref_r = ref_l + a->mtch_len;
  uint32_t read_l = a->index_in_read;
  uint32_t read_r = read_l + a->mtch_len;
  if (new_chain) {
    a->chain_id = (uint16_t)c->chain_id;
    a->chain_anchor_pre = nullptr;
    c->ref_ID = a->ref_ID;
    c->direction = a->direction;
    c->q_t_dis = (int32_t)(a->ref_offset - a->index_in_read);
    c->t_st = ref_l;
    c->t_ed = ref_r;
    c->q_st = read_l;
    c->q_ed = read_r;
    c->with_top_anchor = !a->anchor_useless;
    c->anchor_number = 1;
    c->sum_score = a->duplicate ? 1 : (uint32_t)a->score;
    c->indel = 0;
    c->chain_anchor_cur = a;
  } else {
    a->chain_id = (uint16_t)c->chain_id;
    c->with_top_anchor |= !a->anchor_useless;
    if (c->q_ed >= read_r) return;
    c->t_ed = std::max(ref_r, c->t_ed);
    c->q_ed = read_r;
    a->chain_anchor_pre = c->chain_anchor_cur;
    c->chain_anchor_cur = a;
    c->q_t_dis = (int32_t)(a->ref_offset - a->index_in_read);
    c->indel += (uint32_t)dis_minus;
    c->anchor_number++;
    c->sum_score += a->duplicate ? 1 : (uint32_t)a->score;
  }
}

// chain_insert_M2 (cly.c:200-223)
static void chain_insert_m2(AnchorC* a, std::vector<ChainC>& chains) {
  int32_t dis = (int32_t)(a->ref_offset - a->index_in_read);
  for (auto& c : chains) {
    if (c.direction == a->direction && c.ref_ID == a->ref_ID) {
      int dis_minus = std::abs(dis - c.q_t_dis);
      if (dis_minus < 30 && absu(c.t_ed, a->ref_offset) < 400) {
        chain_insert_meta(a, &c, false, dis_minus);
        return;
      }
    }
  }
  ChainC nc{};
  nc.chain_id = (uint32_t)chains.size();
  chains.push_back(nc);
  chain_insert_meta(a, &chains.back(), true, 0);
}

static int anchor_cmp_pos(const void* a_, const void* b_) {
  // Anchor_cmp_by_chr_ID_and_pos (cly.c:225-234): returns 0/1 only
  const AnchorC* a = (const AnchorC*)a_;
  const AnchorC* b = (const AnchorC*)b_;
  if (a->ref_ID != b->ref_ID) return a->ref_ID > b->ref_ID;
  if (a->direction != b->direction) return a->direction > b->direction;
  return a->ref_offset > b->ref_offset;
}

// chain_insert_M3 (cly.c:237-322)
static void chain_insert_m3(std::vector<AnchorC>& anchors,
                            std::vector<ChainC>& chains) {
  qsort(anchors.data(), anchors.size(), sizeof(AnchorC), anchor_cmp_pos);
  int score_v[1024];
  size_t n = anchors.size();
  size_t st = 0;
  while (st < n) {
    size_t ed = st + 1;
    uint32_t ref_ID = anchors[st].ref_ID;
    uint8_t direction = anchors[st].direction;
    while (ed < n && anchors[ed].ref_ID == ref_ID &&
           anchors[ed].direction == direction &&
           (uint32_t)(anchors[ed].ref_offset - anchors[ed - 1].ref_offset) <
               2000)
      ed++;
    if (ed - st > 1024) ed = st + 1024;
    AnchorC* max_anchor = nullptr;
    int max_score = 0;
    for (size_t ci = st; ci < ed; ci++) {
      AnchorC* c_a = &anchors[ci];
      c_a->chain_anchor_pre = nullptr;
      int anchor_max = c_a->score;
      uint32_t max_t = c_a->ref_offset + 3;
      uint32_t max_q = c_a->index_in_read + 3;
      for (size_t pj = ci; pj-- > st;) {
        AnchorC* pre = &anchors[pj];
        if (pre->index_in_read + pre->mtch_len > max_q) continue;
        if (pre->ref_offset + pre->mtch_len > max_t) continue;
        if (pre->index_in_read + 1000 < max_q) break;
        if (pre->ref_offset + 1000 < max_t) break;
        int indel = (int32_t)(pre->index_in_read - pre->ref_offset -
                              (max_q - max_t));
        int a_indel = std::abs(indel);
        if (a_indel > 200) continue;
        int new_score = score_v[pj - st] + c_a->mtch_len - (a_indel >> 4) -
                        ((int32_t)(max_q - pre->index_in_read) >> 8);
        if (new_score > anchor_max) {
          anchor_max = new_score;
          c_a->chain_anchor_pre = pre;
        }
      }
      score_v[ci - st] = anchor_max;
      if (max_score < anchor_max) {
        max_score = anchor_max;
        max_anchor = c_a;
      }
    }
    int sum_indel = 0;
    uint32_t anchor_number = 1;
    AnchorC* pre = max_anchor;
    uint32_t sum_score = max_anchor->duplicate ? 1 : (uint32_t)max_anchor->score;
    uint8_t with_top = !max_anchor->anchor_useless;
    while (pre->chain_anchor_pre != nullptr) {
      AnchorC* pre_ = (AnchorC*)pre->chain_anchor_pre;
      sum_indel += (int32_t)((pre->index_in_read - pre_->index_in_read) -
                             (pre->ref_offset - pre_->ref_offset));
      with_top |= !pre->anchor_useless;
      sum_score += pre->duplicate ? 1 : (uint32_t)pre->score;
      pre = pre_;
      anchor_number++;
    }
    ChainC nc{};
    nc.chain_id = (uint32_t)chains.size();
    nc.ref_ID = ref_ID;
    nc.direction = direction;
    nc.q_t_dis = (int32_t)(max_anchor->ref_offset - max_anchor->index_in_read);
    nc.t_st = pre->ref_offset;
    nc.t_ed = max_anchor->ref_offset + max_anchor->mtch_len;
    nc.q_st = pre->index_in_read;
    nc.q_ed = max_anchor->index_in_read + max_anchor->mtch_len;
    nc.with_top_anchor = with_top;
    nc.anchor_number = anchor_number;
    nc.sum_score = sum_score;
    nc.indel = (uint32_t)sum_indel;
    nc.chain_anchor_cur = max_anchor;
    chains.push_back(nc);
    st = ed;
  }
}

static int chain_cmp_by_score(const void* a_, const void* b_) {
  // cly.c:37-51
  const ChainC* a = (const ChainC*)a_;
  const ChainC* b = (const ChainC*)b_;
  if (a->with_top_anchor != b->with_top_anchor)
    return a->with_top_anchor ? -1 : 1;
  int sa = (int)(a->sum_score + ((a->q_ed - a->q_st) << 1)) -
           (int)(a->indel << 2);
  int sb = (int)(b->sum_score + ((b->q_ed - b->q_st) << 1)) -
           (int)(b->indel << 2);
  if (sa < sb) return 1;
  if (sa > sb) return -1;
  return 0;
}

// resolve_tree (cly.c:325-348)
static void resolve_tree(ReadResultC& res) {
  res.hits.clear();
  if (res.anchors.size() < 50) {
    for (auto& a : res.anchors) chain_insert_m2(&a, res.hits);
  } else {
    chain_insert_m3(res.anchors, res.hits);
  }
  if (res.hits.size() > 1)
    qsort(res.hits.data(), res.hits.size(), sizeof(ChainC),
          chain_cmp_by_score);
  size_t rst_num = std::min<size_t>(5, res.hits.size());
  while (rst_num < res.hits.size() && res.hits[rst_num].with_top_anchor == 1)
    rst_num++;
  res.hits.resize(rst_num);
}
// -------------------------------------------------------------- rescore ----
struct ReadHash {  // build_hash_table_M2 (cly.c:2168-2219) per direction
  std::unordered_map<uint32_t, std::vector<int32_t>> tbl;
  void build(const uint8_t* b, int q_len) {
    tbl.clear();
    uint32_t kmer = 0;
    for (int i = 0; i < 8; i++) kmer = (kmer << 2) | b[i];
    const uint32_t mask = (1u << 18) - 1;
    for (int c_pos = 0; c_pos + 9 <= q_len; c_pos++) {
      kmer = ((kmer << 2) | b[c_pos + 8]) & mask;
      tbl[kmer].push_back(c_pos);
    }
  }
};

// MEM_search (cly.c:1805-1813) on two buffers with validity ranges
struct BufView {
  const uint8_t* p;
  int64_t lo, hi;  // valid index range [lo, hi)
  inline int at(int64_t i) const {
    return (i >= lo && i < hi) ? p[i] : (int)(-9 + (i & 1));
  }
};
static int mem_search(const BufView& a, int64_t ai, const BufView& b,
                      int64_t bi, bool forward, int64_t maxlen) {
  int n = 0;
  int step = forward ? 1 : -1;
  while (n < maxlen) {
    int ca = a.at(ai), cb = b.at(bi);
    if (ca != cb || ca < 0) break;
    n++;
    ai += step;
    bi += step;
  }
  return n;
}

// sdp_match (cly.c:2330-2435); t has a base offset for the ref+50 quirk
static void sdp_match(uint32_t q_bg, uint32_t q_ed, const BufView& q,
                      int64_t q_off, const BufView& t, int64_t t_len,
                      const ReadHash& rh, std::vector<SpdMatch>& sms,
                      uint32_t t_st, bool is_forward) {
  int64_t t_kmer_num = t_len - 9 + 1;
  for (int64_t i = 4; i < t_kmer_num; i++) {
    if ((i & 3) != 0) continue;
    int64_t tp = is_forward ? i : (t_len - 9 - i);
    uint32_t kmer = 0;
    bool valid = true;
    for (int k = 0; k < 9; k++) {
      int c = t.at(tp + k);
      if (c < 0 || c > 3) {
        valid = false;
        break;
      }
      kmer = (kmer << 2) | (uint32_t)c;
    }
    if (!valid) continue;
    auto it = rh.tbl.find(kmer);
    if (it == rh.tbl.end()) continue;
    for (int32_t q_pos : it->second) {
      if (!((uint32_t)q_pos >= q_bg && (uint32_t)q_pos <= q_ed)) continue;
      if (is_forward) {
        int back_len = mem_search(q, q_off + q_pos - 1, t, tp - 1, false, 4);
        if (back_len < 4 || i == 4) {
          uint32_t ms = q_ed - (uint32_t)q_pos - 1;  // u32 wrap intended
          int64_t max_search = std::min<int64_t>(ms, t_len - i - 1) + 50;
          int fwd = mem_search(q, q_off + q_pos + 9, t, tp + 9, true,
                               max_search);
          int total = back_len + fwd + 1;
          if (total >= 4)
            sms.push_back({(uint32_t)(i - back_len + t_st),
                           (uint32_t)(q_pos - back_len), total, 0});
        }
      } else {
        int fwd = mem_search(q, q_off + q_pos + 9, t, tp + 9, true, 4);
        if (fwd < 4 || i == 4) {
          int64_t max_search = std::min<int64_t>(q_pos, tp) + 50;
          int back_len =
              mem_search(q, q_off + q_pos - 1, t, tp - 1, false, max_search);
          int total = back_len + fwd + 1;
          if (total >= 4)
            sms.push_back({(uint32_t)(tp - back_len + t_st),
                           (uint32_t)(q_pos - back_len), total, 0});
        }
      }
    }
  }
}

// sc_hash (cly.c:1686-1705): 256 ordered buckets of (seed_id, s_or_e)
struct ScHash {
  std::vector<std::pair<int, int>> b[256];
  void build(const std::vector<ChainC>& hits) {
    for (int k = 0; k < 256; k++) b[k].clear();
    for (size_t ci = 0; ci < hits.size(); ci++) {
      for (int i = 1; i >= 0; i--) {
        uint32_t key = (i == 1 ? hits[ci].t_st - hits[ci].q_st
                               : hits[ci].t_ed - hits[ci].q_ed) &
                       0xFF;
        b[key].push_back({(int)ci + 1, i});
      }
    }
  }
};

// combine_chain (cly.c:1758-1803)
static ChainC* combine_chain(std::vector<ChainC>& hits, int chain_id,
                             const ScHash& sc, int dis, bool isleft,
                             int c_q_pos) {
  uint32_t key = (uint32_t)dis & 0xFF;
  ChainC* c_h = &hits[chain_id];
  for (auto& e : sc.b[key]) {
    ChainC* c = &hits[e.first - 1];
    int dis_con = (int32_t)(isleft ? c->t_ed - c->q_ed : c->t_st - c->q_st);
    int q_pos_con = !isleft ? (int32_t)c->q_st : (int32_t)(c->q_ed - 9);
    if (dis == dis_con && c != c_h && (isleft ? 1 : 0) != e.second &&
        (uint32_t)std::abs(c_q_pos - q_pos_con) < 8 &&
        c_h->ref_ID == c->ref_ID && c_h->direction == c->direction &&
        c->sum_score != 0 && e.first - 1 > chain_id) {
      c_h->sum_score += c->sum_score;
      c_h->anchor_number += c->anchor_number;
      c_h->indel += c->indel;
      c_h->q_st = std::min(c_h->q_st, c->q_st);
      c_h->t_st = std::min(c_h->t_st, c->t_st);
      c_h->q_ed = std::max(c_h->q_ed, c->q_ed);
      c_h->t_ed = std::max(c_h->t_ed, c->t_ed);
      c->sum_score = 0;
      c->t_st = c->t_ed = c->q_st = c->q_ed = 0;
      return c;
    }
  }
  return nullptr;
}

// sdp_middle_M2 (cly.c:2439-2525)
static int sdp_middle_m2(const IndexView& ix, AnchorC* c_a, const ReadHash& rh,
                         const BufView& q, int64_t q_off, bool* aborted) {
  int score = 10000;
  int64_t t_offset = ix.ref_offset[c_a->ref_ID];
  std::vector<SpdMatch> sms;
  uint8_t refbuf[2100];
  while (c_a != nullptr) {
    AnchorC* pre_a = (AnchorC*)c_a->chain_anchor_pre;
    if (pre_a != nullptr) {
      int pre_mch = pre_a->mtch_len;
      int32_t pre_refoffset = (int32_t)(pre_a->ref_offset - 3);
      int32_t total_ref_len =
          (int32_t)(c_a->ref_offset - (uint32_t)(pre_refoffset + pre_mch) + 3);
      sms.clear();
      sms.push_back({pre_a->ref_offset, pre_a->index_in_read,
                     pre_a->mtch_len - 9 + 1, score});
      if (total_ref_len > 12) {
        if (total_ref_len >= 2000) {
          *aborted = true;  // xassert in the reference (cly.c:2468)
          return 0;
        }
        int64_t ref_off = (int64_t)pre_refoffset + t_offset + pre_mch;
        get_ref(ix, refbuf, ref_off, total_ref_len, true);
        BufView tv{refbuf, 0, total_ref_len};
        sdp_match((uint32_t)(pre_a->index_in_read + pre_mch - 8),
                  (uint32_t)(c_a->index_in_read - 1), q, q_off, tv,
                  total_ref_len, rh, sms, (uint32_t)(pre_refoffset + pre_mch),
                  true);
      }
      sms.push_back({c_a->ref_offset, c_a->index_in_read,
                     c_a->mtch_len - 9 + 1, 0});
      if (sms.size() > 1) {
        for (size_t ci = 1; ci < sms.size(); ci++) {
          SpdMatch& c_spd = sms[ci];
          int max_score = c_spd.len;
          uint32_t max_q = c_spd.q_pos + 6;
          uint32_t max_t = c_spd.t_pos + 6;
          for (size_t pj = ci; pj-- > 0;) {
            SpdMatch& p = sms[pj];
            int32_t pre_q_ed = (int32_t)(p.q_pos + p.len + 9 - 1);
            int32_t pre_t_ed = (int32_t)(p.t_pos + p.len + 9 - 1);
            if ((uint32_t)pre_q_ed > max_q) continue;
            if ((uint32_t)pre_t_ed > max_t) continue;
            int indel = (int32_t)(p.q_pos - p.t_pos - (max_q - max_t));
            int ai = std::abs(indel);
            if (ai > 200) continue;
            int new_score = p.score + c_spd.len - (ai >> 3);
            if ((uint32_t)pre_q_ed > c_spd.q_pos ||
                (uint32_t)pre_t_ed > c_spd.t_pos) {
              int oq = pre_q_ed - (int32_t)c_spd.q_pos;
              int ot = pre_t_ed - (int32_t)c_spd.t_pos;
              new_score -= std::max(oq, ot);
            }
            max_score = std::max(max_score, new_score);
          }
          score = std::max(max_score, score);
          c_spd.score = max_score;
        }
      }
    } else {
      score += c_a->mtch_len - 9 + 1;
    }
    c_a = pre_a;
  }
  return score - 10000;
}

// sdp_right_M2 (cly.c:2527-2672): extend a chain rightwards over 600 bp
// reference windows, combining with downstream chains on strong matches.
static int sdp_right_m2(const IndexView& ix, const ReadHash& rh, const BufView& q,
                        int64_t q_off, std::vector<ChainC>& hits, int chain_id,
                        uint32_t l_read, const ScHash& sc, int score_in,
                        bool* aborted) {
  int score_ori = score_in + 10000;
  int total_max = score_ori;
  size_t max_sms_id = 0;
  ChainC* c_h = &hits[chain_id];
  std::vector<SpdMatch> sms;
  sms.push_back({c_h->t_ed, c_h->q_ed, 1 - 9, score_ori});
  size_t current = 1;
  int64_t t_offset_global = ix.ref_offset[c_h->ref_ID];
  uint32_t t_length = (uint32_t)ix.ref_len[c_h->ref_ID];
  uint32_t c_t_offset = c_h->t_ed - 3;
  bool last_search = false;
  uint8_t refbuf[700];
  while (true) {
    if (sms.size() == current) {
      uint32_t next_step = t_length - c_t_offset;
      if (next_step < 12) break;  // MIN_SCORE_MEM
      uint32_t max_search_ref;
      if ((uint32_t)(l_read - c_h->q_ed) < 600) {
        if (last_search) break;
        last_search = true;
        max_search_ref = l_read - c_h->q_ed + 60;
      } else {
        max_search_ref = t_length - c_t_offset;
      }
      max_search_ref = std::min<uint32_t>(600, max_search_ref);
      get_ref(ix, refbuf, (int64_t)c_t_offset + t_offset_global,
              (int64_t)max_search_ref + 50, true);
      BufView tv{refbuf, 0, (int64_t)max_search_ref + 50};
      // MIN/MAX mix int with uint32 -> unsigned compare (cly.c:2585-2587)
      int32_t search_q_ed = (int32_t)std::min<uint32_t>(
          (uint32_t)((int32_t)sms[max_sms_id].q_pos + 1000), l_read);
      int32_t search_q_st = (int32_t)std::max<uint32_t>(
          (uint32_t)(search_q_ed - 2000), c_h->q_st - 8);
      sdp_match((uint32_t)search_q_st, (uint32_t)search_q_ed, q, q_off, tv,
                max_search_ref, rh, sms, c_t_offset, true);
      c_t_offset = c_t_offset + max_search_ref - 9 - 3;
      if (sms.size() == current) break;
      if (sms[current].t_pos > sms[max_sms_id].t_pos + 1000) break;
    }
    size_t cur_i = current;
    current++;
    int max_score = sms[cur_i].len;
    uint32_t max_pre_q = sms[cur_i].q_pos + 6;  // MAX_SMS_OVERLAP
    uint32_t max_pre_t = sms[cur_i].t_pos + 6;
    for (size_t pj = cur_i; pj-- > 0;) {
      SpdMatch& p = sms[pj];
      int32_t pre_q_ed = (int32_t)(p.q_pos + p.len + 9 - 1);
      int32_t pre_t_ed = (int32_t)(p.t_pos + p.len + 9 - 1);
      if ((uint32_t)pre_q_ed > max_pre_q) continue;
      if ((uint32_t)pre_t_ed > max_pre_t) continue;
      if (p.t_pos + 600 < max_pre_t) break;
      int indel = (int32_t)(p.q_pos - p.t_pos - (max_pre_q - max_pre_t));
      int ai = std::abs(indel);
      if (ai > 200) continue;
      int new_score = p.score + sms[cur_i].len - (ai >> 3);
      if ((uint32_t)pre_q_ed > sms[cur_i].q_pos ||
          (uint32_t)pre_t_ed > sms[cur_i].t_pos) {
        int oq = pre_q_ed - (int32_t)sms[cur_i].q_pos;
        int ot = pre_t_ed - (int32_t)sms[cur_i].t_pos;
        new_score -= std::max(oq, ot);
      }
      max_score = std::max(max_score, new_score);
    }
    sms[cur_i].score = max_score;
    if (sms[cur_i].len >= 8) {
      ChainC* combined = combine_chain(
          hits, chain_id, sc, (int32_t)(sms[cur_i].t_pos - sms[cur_i].q_pos),
          false, (int32_t)sms[cur_i].q_pos);
      if (combined != nullptr) {
        total_max = std::max(score_ori, max_score) - sms[cur_i].len +
                    sdp_middle_m2(ix, combined->chain_anchor_cur, rh, q, q_off,
                                  aborted);
        if (*aborted) return 0;
        score_ori = total_max;
        max_sms_id = 0;
        sms.clear();
        sms.push_back({c_h->t_ed, c_h->q_ed, -9, total_max});
        current = 1;
        c_t_offset = c_h->t_ed;
        continue;
      }
    }
    if (total_max < max_score) {
      total_max = max_score;
      max_sms_id = cur_i;
    }
    if (sms[cur_i].t_pos > sms[max_sms_id].t_pos + 1000) break;
  }
  c_h->q_ed = (uint32_t)(sms[max_sms_id].q_pos + sms[max_sms_id].len + 9);
  c_h->t_ed = (uint32_t)(sms[max_sms_id].t_pos + sms[max_sms_id].len + 9);
  return total_max - 10000;
}

// sdp_left_M2 (cly.c:2674-2814); preserves the t_offset_global==0 "//bug"
// branch (cly.c:2719-2720) where only max_search_ref bytes are loaded yet the
// scan still starts at ref+OVER_SEARCH_M2.
static int sdp_left_m2(const IndexView& ix, const ReadHash& rh, const BufView& q,
                       int64_t q_off, std::vector<ChainC>& hits, int chain_id,
                       uint32_t l_read, const ScHash& sc, int score_in,
                       bool* aborted) {
  (void)l_read;
  int score_ori = score_in + 10000;
  int total_max = score_ori;
  size_t max_sms_id = 0;
  ChainC* c_h = &hits[chain_id];
  std::vector<SpdMatch> sms;
  sms.push_back({c_h->t_st, c_h->q_st, 0, score_ori});
  size_t current = 1;
  int64_t t_offset_global = ix.ref_offset[c_h->ref_ID];
  uint32_t c_t_offset = c_h->t_st + 3;
  bool last_search = false;
  uint8_t refbuf[700];
  while (true) {
    if (sms.size() == current) {
      uint32_t next_step = c_t_offset;
      if (next_step < 12) break;
      uint32_t max_search_ref;
      if (c_h->q_st < 600) {
        if (last_search) break;
        last_search = true;
        max_search_ref = c_h->q_st + 60;
      } else {
        max_search_ref = c_t_offset;
      }
      max_search_ref = std::min<uint32_t>(600, max_search_ref);
      BufView tv{nullptr, 0, 0};
      if (t_offset_global == 0 && c_t_offset < 50u + max_search_ref) {
        get_ref(ix, refbuf,
                (int64_t)c_t_offset + t_offset_global - max_search_ref,
                max_search_ref, true);
        tv = BufView{refbuf + 50, -50, (int64_t)max_search_ref - 50};
      } else {
        get_ref(ix, refbuf,
                (int64_t)c_t_offset + t_offset_global - max_search_ref - 50,
                (int64_t)max_search_ref + 50, true);
        tv = BufView{refbuf + 50, -50, (int64_t)max_search_ref};
      }
      // MAX(int,int) but MIN mixes int with uint32 (cly.c:2734-2736)
      int32_t search_q_st = std::max((int32_t)sms[max_sms_id].q_pos - 1000, 0);
      int32_t search_q_ed = (int32_t)std::min<uint32_t>(
          (uint32_t)(search_q_st + 2000), c_h->q_st - 1);
      sdp_match((uint32_t)search_q_st, (uint32_t)search_q_ed, q, q_off, tv,
                max_search_ref, rh, sms, c_t_offset - max_search_ref, false);
      c_t_offset = c_t_offset - max_search_ref + 9 + 3;
      if (sms.size() == current) break;
      if (sms[current].t_pos + 1000 < sms[max_sms_id].t_pos) break;
    }
    size_t cur_i = current;
    current++;
    int max_score = sms[cur_i].len;
    uint32_t min_pre_q = sms[cur_i].q_pos + sms[cur_i].len - 6 + 9 - 1;
    uint32_t min_pre_t = sms[cur_i].t_pos + sms[cur_i].len - 6 + 9 - 1;
    for (size_t pj = cur_i; pj-- > 0;) {
      SpdMatch& p = sms[pj];
      if (p.q_pos < min_pre_q) continue;
      if (p.t_pos < min_pre_t) continue;
      if (min_pre_t + 600 < p.t_pos) break;
      int indel = (int32_t)(p.q_pos - p.t_pos - (min_pre_q - min_pre_t));
      int ai = std::abs(indel);
      if (ai > 200) continue;
      int new_score = p.score + sms[cur_i].len - (ai >> 3);
      if (min_pre_q + 6 > p.q_pos || min_pre_t + 6 > p.t_pos) {
        int oq = (int32_t)((min_pre_q + 6) - p.q_pos);
        int ot = (int32_t)((min_pre_t + 6) - p.t_pos);
        new_score -= std::max(oq, ot);
      }
      max_score = std::max(max_score, new_score);
    }
    sms[cur_i].score = max_score;
    if (sms[cur_i].len >= 8) {
      ChainC* combined = combine_chain(
          hits, chain_id, sc, (int32_t)(sms[cur_i].t_pos - sms[cur_i].q_pos),
          true, (int32_t)(sms[cur_i].q_pos + sms[cur_i].len));
      if (combined != nullptr) {
        total_max = std::max(score_ori, max_score) - sms[cur_i].len +
                    sdp_middle_m2(ix, combined->chain_anchor_cur, rh, q, q_off,
                                  aborted);
        if (*aborted) return 0;
        score_ori = total_max;
        max_sms_id = 0;
        sms.clear();
        sms.push_back({c_h->t_st, c_h->q_st, 0, total_max});
        current = 1;
        c_t_offset = c_h->t_st;
        continue;
      }
    }
    if (total_max < max_score) {
      total_max = max_score;
      max_sms_id = cur_i;
    }
    if (sms[cur_i].t_pos + 1000 < sms[max_sms_id].t_pos) break;
  }
  c_h->q_st = sms[max_sms_id].q_pos;
  c_h->t_st = sms[max_sms_id].t_pos;
  return total_max - 10000;
}

// get_score_M2 (cly.c:2816-2844): per-direction 9-mer read hash, then
// middle/right/left SDP rescoring of every surviving chain.
static void get_score_m2_all(const IndexView& ix, const uint8_t* f,
                             uint32_t l_read, std::vector<ChainC>& hits,
                             const ScHash& sc, const BufView& q,
                             bool* aborted) {
  int both = 0;
  for (auto& h : hits) {
    both |= (h.direction == 1) ? 2 : 1;
    if (both == 3) break;
  }
  ReadHash rh_f, rh_r;  // build_hash_table_M2 (cly.c:2168-2219)
  if (both & 2) rh_f.build(f, (int)l_read);
  if (both & 1) rh_r.build(f + l_read, (int)l_read);
  for (size_t i = 0; i < hits.size(); i++) {
    ChainC& h = hits[i];
    if (h.sum_score == 0) continue;
    const ReadHash& rh = h.direction == 1 ? rh_f : rh_r;
    int64_t q_off = h.direction == 1 ? 0 : (int64_t)l_read;
    int score = sdp_middle_m2(ix, h.chain_anchor_cur, rh, q, q_off, aborted);
    if (*aborted) return;
    score = sdp_right_m2(ix, rh, q, q_off, hits, (int)i, l_read, sc, score,
                         aborted);
    if (*aborted) return;
    score = sdp_left_m2(ix, rh, q, q_off, hits, (int)i, l_read, sc, score,
                        aborted);
    if (*aborted) return;
    h.sum_score = (uint32_t)score;
  }
}

// ------------------------------------------------- filter + primary ----
static int chain_cmp_by_pos(const void* a_, const void* b_) {  // cly.c:2848
  const ChainC* a = (const ChainC*)a_;
  const ChainC* b = (const ChainC*)b_;
  if (a->ref_ID > b->ref_ID) return 1;
  if (a->ref_ID < b->ref_ID) return -1;
  if (a->t_st > b->t_st) return 1;
  if (a->t_st < b->t_st) return -1;
  if (a->sum_score < b->sum_score) return 1;
  if (a->sum_score > b->sum_score) return -1;
  return 0;
}

static int chain_cmp_by_mem_score(const void* a_, const void* b_) {
  // cly.c:53-63: ties return sum_score%2 — glibc-order dependent, which is
  // why we call the real glibc qsort on same-size elements.
  const ChainC* a = (const ChainC*)a_;
  const ChainC* b = (const ChainC*)b_;
  int32_t sa = (int32_t)(a->sum_score << 5);
  int32_t sb = (int32_t)(b->sum_score << 5);
  if (sa < sb) return 1;
  if (sa > sb) return -1;
  return (int)(a->sum_score % 2);
}

// delete_small_score_rst (cly.c:2878-2988)
static void delete_small_score_rst(const IndexView& ix, ReadResultC& res,
                                   const uint8_t* f, uint32_t l_read, Buff& bf,
                                   const BufView& q, bool* aborted) {
  auto& hits = res.hits;
  if (hits.empty()) return;
  if (hits.size() > 200) {
    size_t rst_num = 200;
    while (rst_num < hits.size() && hits[rst_num].sum_score > 50) rst_num++;
    hits.resize(rst_num);
  }
  if (hits.size() > 400) hits.resize(400);
  ScHash sc;  // sc_hash_idx (cly.c:1686-1705)
  sc.build(hits);
  get_score_m2_all(ix, f, l_read, hits, sc, q, aborted);
  if (*aborted) return;
  if (hits.size() > 1)
    qsort(hits.data(), hits.size(), sizeof(ChainC), chain_cmp_by_pos);
  size_t n = hits.size();
  for (size_t ci = 0; ci + 1 < n; ci++) {  // merge near-adjacent (cly.c:2913)
    ChainC& c_c = hits[ci];
    if (c_c.sum_score == 0) continue;
    for (size_t ni = ci + 1; ni < n; ni++) {
      ChainC& nx = hits[ni];
      if (c_c.ref_ID == nx.ref_ID) {
        if (c_c.direction != nx.direction) continue;
        if (nx.sum_score == 0) continue;
        if (nx.t_st < c_c.t_st + 5 && nx.q_st < c_c.q_st + 5 &&
            nx.sum_score < c_c.sum_score + 5) {
          nx.sum_score = 0;
          nx.q_ed = nx.q_st;
          nx.t_ed = nx.t_st;
          continue;
        }
        int32_t dis_t = (int32_t)(nx.t_st - c_c.t_ed);
        int32_t dis_q = (int32_t)(nx.q_st - c_c.q_ed);
        int dis_t_q = std::abs(dis_t - dis_q);
        if (dis_t > -20 && dis_t < 1000 && dis_q > -20 && dis_q < 1000 &&
            dis_t_q < 200) {
          c_c.t_ed = std::max(c_c.t_ed, nx.t_ed);
          c_c.q_ed = std::max(c_c.q_ed, nx.q_ed);
          c_c.sum_score += nx.sum_score;
          nx.sum_score = 0;
          nx.q_ed = nx.q_st;
          nx.t_ed = nx.t_st;
        }
      } else
        break;
    }
  }
  // length-class thresholds (cly.c:2953-2981); buff max_read_l persists
  bf.max_read_l = std::max(bf.max_read_l, (int)l_read);
  if (bf.max_read_l < 510) {  // NGS
    for (auto& c : hits) {
      int32_t score = (int32_t)(c.sum_score + ((c.q_ed - c.q_st) >> 5));
      if (score < 26) c.sum_score = 0;
    }
  } else if (l_read < 310) {  // short 3G
    for (auto& c : hits) {
      int32_t score = (int32_t)(c.sum_score + ((c.q_ed - c.q_st) >> 5));
      if (score < 30) c.sum_score = 0;
    }
  } else {  // long 3G
    for (auto& c : hits) {
      int32_t score = (int32_t)(c.sum_score + ((c.q_ed - c.q_st) >> 5));
      if (score < ix.filter_min_score_lv3 &&
          ((c.q_ed - c.q_st) < (uint32_t)ix.filter_min_length ||
           score < ix.filter_min_score))
        c.sum_score = 0;
    }
  }
  if (hits.size() > 1)
    qsort(hits.data(), hits.size(), sizeof(ChainC), chain_cmp_by_mem_score);
  size_t cut = hits.size();
  for (size_t i = 0; i < hits.size(); i++)
    if (hits[i].sum_score == 0) {
      cut = i;
      break;
    }
  hits.resize(cut);
}

// detect_primary (cly.c:2990-3053)
static void detect_primary(std::vector<ChainC>& hits, uint32_t read_len) {
  if (hits.empty()) return;
  std::vector<int> primary_v;
  std::vector<uint8_t> primary_idx;
  primary_v.push_back(0);
  primary_idx.push_back(0);
  hits[0].pri_index = 0;
  hits[0].primary = 1;  // PRIMARY
  for (auto& c : hits)  // q_st underflow patch (cly.c:3005-3007)
    if (c.q_st > 4294960000u) c.q_st = 0;
  for (size_t hi = 1; hi < hits.size(); hi++) {
    ChainC& ch = hits[hi];
    bool overlap = false;
    for (size_t i = 0; i < primary_v.size(); i++) {
      ChainC& p = hits[primary_v[i]];
      int32_t primary_st, primary_ed;
      if (p.direction == ch.direction) {
        primary_st = (int32_t)p.q_st;
        primary_ed = (int32_t)p.q_ed;
      } else {
        primary_st = (int32_t)(read_len - p.q_ed);
        primary_ed = (int32_t)(read_len - p.q_st);
      }
      uint32_t overlap_st = std::max(ch.q_st, (uint32_t)primary_st);
      uint32_t overlap_ed = std::min(ch.q_ed, (uint32_t)primary_ed);
      if (overlap_st < overlap_ed &&
          ((overlap_ed - overlap_st) << 1) >= (ch.q_ed - ch.q_st))
        overlap = true;
      if (overlap) {
        ch.primary = 2;  // SECONDARY
        primary_idx[i] = (uint8_t)(primary_idx[i] + 1);
        ch.pri_index = primary_idx[i];
        uint32_t max_gap = std::max<uint32_t>(p.sum_score >> 6, 5);
        if (ch.sum_score + max_gap > p.sum_score) ch.pri_index = 1;
        if (primary_idx[i] == 255) primary_idx[i] = 254;
        break;
      }
    }
    if (!overlap) {
      ch.primary = 3;  // SUPPLEMENTARY
      ch.pri_index = 0;
      primary_idx.push_back(0);
      primary_v.push_back((int)hi);
      if (primary_v.size() > 750) primary_v.resize(750);
    }
  }
}

// ------------------------------------------------- fast / slow loops ----
static int memrst_cmp(const void* a_, const void* b_) {  // cly.c:1544 MEM sort
  return ((const MemRstC*)b_)->match_len - ((const MemRstC*)a_)->match_len;
}

// fast_classify (cly.c:1471-1541)
static void fast_classify(const IndexView& ix, SearchDirC& sd,
                          const uint8_t* bin2, int64_t bin_len, int64_t bin_off,
                          uint32_t read_len, std::vector<AnchorC>& anchors,
                          bool* aborted) {
  int lek = ix.ek_len;
  int min_index = 21 - lek;  // MIN_MEM_LEN_FAST - lek
  SpSet sp_set;
  auto& sv = sd.seeds;
  std::vector<MemRstC> mr;
  size_t ci = 0;
  while (ci < sv.size()) {
    Seed& c_sv = sv[ci];
    if (!c_sv.top) {
      ci++;
      continue;
    }
    sp_set.reset();
    uint16_t seed_id = (uint16_t)ci;
    size_t a_b_idx = anchors.size();
    int j = (int)c_sv.len - 1;
    while (j >= min_index) {
      int kmer_index = (int)c_sv.offset + j;
      uint32_t pre_v = (uint32_t)(sd.kmers[kmer_index] & 0x3FFFFFFull);
      int string_index = kmer_index + lek - 1;
      mr.clear();
      int n = bwt_mem_search(ix, bin2, bin_len, bin_off + string_index, pre_v,
                             2, 20, string_index, sp_set, mr, aborted);
      if (*aborted) return;
      if (n == 0) {
        j -= 2;
        continue;
      }
      j -= 3;
      int max_score = 0;
      for (auto& m : mr) {
        m.read_offset = string_index - m.match_len;
        int c_score = map_seed(ix, m, bin2 + bin_off, read_len, seed_id,
                               sd.direction, anchors, aborted);
        if (*aborted) return;
        max_score = std::max(c_score, max_score);
      }
      if (max_score > 35) j -= 7;  // adaptive skip (cly.c:1521-1528)
      if (max_score > 256) {
        if (max_score > 512) ci++;
        break;
      }
    }
    int top_score = 35;  // per-seed top marking (cly.c:1531-1537)
    for (size_t k = a_b_idx; k < anchors.size(); k++)
      top_score = std::max(top_score, (int)anchors[k].score);
    for (size_t k = a_b_idx; k < anchors.size(); k++)
      anchors[k].anchor_useless = anchors[k].score < top_score ? 1 : 0;
    ci++;
  }
}

// slow_classify (cly.c:1543-1606)
static void slow_classify(const IndexView& ix, SearchDirC& sd,
                          const uint8_t* bin2, int64_t bin_len, int64_t bin_off,
                          uint32_t read_len, std::vector<AnchorC>& anchors,
                          bool* aborted) {
  int lek = ix.ek_len;
  SpSet sp_set;
  auto& sv = sd.seeds;
  std::vector<MemRstC> mr;
  for (size_t i = 0; i < sv.size(); i++) {
    Seed& c_sv = sv[i];
    // checks sv[0].top, not sv[i].top (reference quirk, cly.c:1559)
    if (c_sv.len < 3 && !(sv[0].top)) continue;
    int min_match_len = std::min(19, lek + 1);
    sp_set.reset();
    mr.clear();
    int j = (int)c_sv.len - 1;
    while (j >= 1) {
      int k_idx = (int)c_sv.offset + j;
      uint32_t pre_v = (uint32_t)(sd.kmers[k_idx] & 0x3FFFFFFull);
      int s_idx = k_idx + lek - 1;
      size_t n0 = mr.size();
      bwt_mem_search(ix, bin2, bin_len, bin_off + s_idx, pre_v, 8,
                     min_match_len, s_idx, sp_set, mr, aborted);
      if (*aborted) return;
      for (size_t k = n0; k < mr.size(); k++)
        mr[k].read_offset = s_idx - mr[k].match_len;
      j -= 2;
    }
    if (mr.empty()) continue;
    if (mr.size() > 1) qsort(mr.data(), mr.size(), sizeof(MemRstC), memrst_cmp);
    size_t a_b_idx = anchors.size();
    size_t lim = std::min(mr.size(), (size_t)8);
    for (size_t k = 0; k < lim; k++) {
      map_seed(ix, mr[k], bin2 + bin_off, read_len, (uint16_t)i, sd.direction,
               anchors, aborted);
      if (*aborted) return;
    }
    int top_score = 35;
    for (size_t k = a_b_idx; k < anchors.size(); k++)
      top_score = std::max(top_score, (int)anchors[k].score);
    for (size_t k = a_b_idx; k < anchors.size(); k++)
      anchors[k].anchor_useless = anchors[k].score < top_score ? 1 : 0;
  }
}

// --------------------------------------------------- per-read driver ----
// CLY_Bit char table (cly.c:16-34): unknown chars -> 'C' (1)
struct ClyTab {
  uint8_t t[256];
  ClyTab() {
    for (int i = 0; i < 256; i++) t[i] = 1;
    t['A'] = t['a'] = 0;
    t['C'] = t['c'] = 1;
    t['G'] = t['g'] = 2;
    t['T'] = t['t'] = 3;
  }
};
static const ClyTab CLY;

// classify_seq (cly.c:3059-3127) + the .so driver's buffer model
static void classify_one(const IndexView& ix, Buff& bf, const uint8_t* seq,
                         int read_len, ReadResultC& res, bool* aborted) {
  res.hits.clear();
  res.anchors.clear();
  res.fast_classify = true;
  *aborted = false;
  if (read_len < 40) return;  // MIN_READ_LEN
  int lek = ix.ek_len;
  int n_kmer = read_len - lek + 1;
  // bin2: [8B modeled malloc-chunk header][forward L][reverse L]
  // (BUFF_REALLOC growth model, lib/utils.h:117-122: buffer only grows)
  if (2 * read_len > bf.m_bin_read) bf.m_bin_read = 2 * read_len + 20;
  bf.bin2.resize(8 + 2 * (size_t)read_len);
  uint64_t csz =
      (uint64_t)(std::max<int64_t>(32, (bf.m_bin_read + 8 + 15) & ~15LL) | 1);
  memcpy(bf.bin2.data(), &csz, 8);
  uint8_t* f = bf.bin2.data() + 8;
  uint8_t* r = f + read_len;
  for (int i = 0; i < read_len; i++) f[i] = CLY.t[seq[i]];
  for (int i = 0; i < read_len; i++) r[i] = 3 - f[read_len - 1 - i];
  SearchDirC sd0, sd1;  // getIsland (cly.c:1231-1263)
  build_search_dir(ix, f, n_kmer, 1, sd0);
  build_search_dir(ix, r, n_kmer, 0, sd1);
  if (sd0.total_score < sd1.total_score) std::swap(sd0, sd1);
  bool both_direction =
      (uint32_t)(sd0.total_score - sd1.total_score) <= (sd0.total_score >> 3);
  int64_t bin_len = 2 * (int64_t)read_len;
  int64_t off0 = sd0.direction == 1 ? 0 : read_len;
  int64_t off1 = sd1.direction == 1 ? 0 : read_len;
  fast_classify(ix, sd0, f, bin_len, off0, read_len, res.anchors, aborted);
  if (*aborted) return;
  if (both_direction) {
    fast_classify(ix, sd1, f, bin_len, off1, read_len, res.anchors, aborted);
    if (*aborted) return;
  }
  resolve_tree(res);
  bool run_slow = false;  // retry logic (cly.c:3098-3122)
  if (res.hits.empty())
    run_slow = true;
  else if (res.hits[0].anchor_number < 5) {
    run_slow = true;
    if (read_len <= 300 && res.hits[0].sum_score > 200) run_slow = false;
  }
  if (run_slow) {
    res.anchors.clear();
    slow_classify(ix, sd0, f, bin_len, off0, read_len, res.anchors, aborted);
    if (*aborted) return;
    resolve_tree(res);
    res.fast_classify = false;
    if (both_direction || res.hits.empty() || res.hits[0].anchor_number < 5) {
      slow_classify(ix, sd1, f, bin_len, off1, read_len, res.anchors, aborted);
      if (*aborted) return;
      resolve_tree(res);
    }
  }
  BufView q{f, -8, bin_len};  // prepad readable at f[-8..-1]
  delete_small_score_rst(ix, res, f, read_len, bf, q, aborted);
  if (*aborted) return;
  detect_primary(res.hits, read_len);
}

}  // namespace

// ------------------------------------------------------------ C ABI ----
// Field order mirrored by ctypes in desamba_tpu/engine/native.py.
extern "C" {

struct DsbIndexDesc {
  const uint8_t* codes;
  const int64_t* cum;
  int64_t cum_stride;
  int64_t L;
  int64_t codes_len;
  const int64_t* rank;
  const int64_t* hash13;
  const uint32_t* sa_uni;
  const uint32_t* sa_off;
  int64_t dollar_pos;
  const int64_t* uni_len;
  const int64_t* reflist;
  int64_t n_unitig;
  const int64_t* refpos_global;
  const int32_t* refpos_refid;
  int64_t n_refpos;
  const int64_t* ref_offset;
  const int64_t* ref_len;
  const uint8_t* ref_bin;
  int64_t ref_total;
  const uint8_t* ek0;
  const uint8_t* ek1;
  uint64_t ek_mask;
  int32_t ek_len;
  int32_t ek_single_base_max;
  const int32_t* q_mem;
  const int32_t* q_lv;
  int32_t filter_min_length;
  int32_t filter_min_score;
  int32_t filter_min_score_lv3;
};

struct DsbEngine {
  IndexView ix;
  std::vector<Buff> buffs;  // per-worker persistent state (kt_for analog)
  int n_threads;
};

void* dsb_engine_create(const DsbIndexDesc* d, int n_threads) {
  auto* e = new DsbEngine();
  IndexView& ix = e->ix;
  ix.codes = d->codes;
  ix.cum = d->cum;
  ix.cum_stride = d->cum_stride;
  ix.L = d->L;
  ix.codes_len = d->codes_len;
  ix.rank = d->rank;
  ix.hash13 = d->hash13;
  ix.sa_uni = d->sa_uni;
  ix.sa_off = d->sa_off;
  ix.dollar_pos = d->dollar_pos;
  ix.uni_len = d->uni_len;
  ix.reflist = d->reflist;
  ix.n_unitig = d->n_unitig;
  ix.refpos_global = d->refpos_global;
  ix.refpos_refid = d->refpos_refid;
  ix.n_refpos = d->n_refpos;
  ix.ref_offset = d->ref_offset;
  ix.ref_len = d->ref_len;
  ix.ref_bin = d->ref_bin;
  ix.ref_total = d->ref_total;
  ix.ek0 = d->ek0;
  ix.ek1 = d->ek1;
  ix.ek_mask = d->ek_mask;
  ix.ek_len = d->ek_len;
  ix.ek_single_base_max = d->ek_single_base_max;
  ix.q_mem = d->q_mem;
  ix.q_lv = d->q_lv;
  ix.filter_min_length = d->filter_min_length;
  ix.filter_min_score = d->filter_min_score;
  ix.filter_min_score_lv3 = d->filter_min_score_lv3;
  e->n_threads = n_threads < 1 ? 1 : n_threads;
  e->buffs.resize(e->n_threads);
  return e;
}

void dsb_engine_destroy(void* p) { delete (DsbEngine*)p; }

// Classify a batch. Reads are striped over workers exactly like kt_for
// without stealing (worker w gets reads w, w+T, ...), so per-worker buffer
// state (max_read_l) evolves deterministically; with n_threads=1 the output
// equals a single-threaded reference run. Hits are returned flattened in
// read order, 12 uint32 per hit:
//   [ref_ID, direction, t_st, t_ed, q_st, q_ed, sum_score, pri_index,
//    primary, anchor_number, indel, q_t_dis]
// *out_hits is malloc'd here; free with dsb_free.
int dsb_classify_batch(void* ep, const uint8_t* seqs, const int64_t* seq_off,
                       const int32_t* seq_len, int64_t n_reads,
                       int32_t* out_nhits, int8_t* out_status,
                       uint32_t** out_hits, int64_t* out_total_hits) {
  auto* e = (DsbEngine*)ep;
  int T = e->n_threads;
  std::vector<std::vector<uint32_t>> recs(n_reads);
  auto work = [&](int w) {
    ReadResultC res;
    bool ab = false;
    for (int64_t i = w; i < n_reads; i += T) {
      classify_one(e->ix, e->buffs[w], seqs + seq_off[i], seq_len[i], res,
                   &ab);
      out_status[i] = ab ? 1 : 0;
      auto& out = recs[i];
      if (!ab) {
        out.reserve(res.hits.size() * 12);
        for (auto& c : res.hits) {
          out.push_back(c.ref_ID);
          out.push_back(c.direction);
          out.push_back(c.t_st);
          out.push_back(c.t_ed);
          out.push_back(c.q_st);
          out.push_back(c.q_ed);
          out.push_back(c.sum_score);
          out.push_back(c.pri_index);
          out.push_back(c.primary);
          out.push_back(c.anchor_number);
          out.push_back(c.indel);
          out.push_back((uint32_t)c.q_t_dis);
        }
      }
      out_nhits[i] = ab ? 0 : (int32_t)res.hits.size();
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> th;
    th.reserve(T);
    for (int w = 0; w < T; w++) th.emplace_back(work, w);
    for (auto& t : th) t.join();
  }
  int64_t total = 0;
  for (auto& rv : recs) total += (int64_t)rv.size();
  uint32_t* flat = (uint32_t*)malloc((size_t)std::max<int64_t>(total, 1) * 4);
  int64_t pos = 0;
  for (auto& rv : recs) {
    memcpy(flat + pos, rv.data(), rv.size() * 4);
    pos += (int64_t)rv.size();
  }
  *out_hits = flat;
  *out_total_hits = total / 12;
  return 0;
}

void dsb_free(void* p) { free(p); }

}  // extern "C"
