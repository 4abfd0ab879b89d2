// Standalone shared-library API: the `desamba.h` three-symbol contract
// (load_index / read_classify / meta_analysis, desamba.h:10-45) as a pure
// C++ library with zero Python dependency — a drop-in for C hosts that
// dlopen the reference's libdesamba.so (main_test.c:29-58).
//
// Ports the semantics of this repo's validated Python implementation
// (desamba_tpu/engine/api.py, desamba_tpu/analysis/meta.py,
// desamba_tpu/index/format_ref.py, desamba_tpu/oracle/driver.py) on top of
// the native classify engine (classify_host.cpp). Reference citations
// (file:line into /root/reference) mark reproduced behavior.
//
// Build: make -C native  ->  libdesamba_tpu.so (also exports the dsb_* batch
// ABI since it compiles classify_host.cpp into the same object).

#include "classify_host.cpp"

#include <zlib.h>

#include <cmath>
#include <functional>
#include <map>
#include <memory>
#include <mutex>

namespace {

// ------------------------------------------------------------ file io ----
static bool read_file_gz(const char* path, std::string& out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  char buf[1 << 16];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) out.append(buf, (size_t)n);
  gzclose(f);
  return true;
}

static bool read_file_raw(const std::string& path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize((size_t)n);
  size_t got = fread(out.data(), 1, (size_t)n, f);
  fclose(f);
  return got == (size_t)n;
}

template <typename T>
static const T* at(const std::vector<uint8_t>& b, size_t off) {
  return reinterpret_cast<const T*>(b.data() + off);
}

// ------------------------------------------------------- fastx parsing ----
struct FqRead {
  std::string name, seq, qual;
};

// kseq-equivalent FASTA/FASTQ parser (kseq_read, lib/utils.c:918-999):
// record at '>'/'@'; name to first space; seq lines until '+'/'>'/'@';
// after '+' skip line then read qual bytes until |qual| == |seq|.
static void parse_fastx(const char* d, size_t n, std::vector<FqRead>& out) {
  size_t i = 0;
  while (i < n && d[i] != '>' && d[i] != '@') i++;
  while (i < n) {
    i++;  // past marker
    FqRead r;
    while (i < n && !isspace((unsigned char)d[i])) r.name.push_back(d[i++]);
    while (i < n && d[i] != '\n') i++;  // rest of header (comment)
    if (i < n) i++;
    while (i < n && d[i] != '>' && d[i] != '@' && d[i] != '+') {
      while (i < n && d[i] != '\n') {
        if (!isspace((unsigned char)d[i])) r.seq.push_back(d[i]);
        i++;
      }
      if (i < n) i++;
    }
    if (i < n && d[i] == '+') {
      while (i < n && d[i] != '\n') i++;  // skip '+' line
      if (i < n) i++;
      while (i < n && r.qual.size() < r.seq.size()) {
        if (!isspace((unsigned char)d[i])) r.qual.push_back(d[i]);
        i++;
      }
      while (i < n && d[i] != '>' && d[i] != '@') i++;  // to next record
    }
    if (!r.name.empty() || !r.seq.empty()) out.push_back(std::move(r));
    if (i >= n) break;
  }
}

// ------------------------------------------------------------ taxonomy ----
struct TaxTree {  // taxonTree_rank, engine variant (cly_mt.c:590-670)
  int64_t max_tid = 0;  // includes +1e6 slack
  std::vector<int64_t> parent;  // MAX_U32 where absent
  std::unordered_map<uint32_t, std::string> rank, name;

  int64_t p_tid(int64_t tid) const {
    return (tid >= 0 && tid <= max_tid) ? parent[(size_t)tid] : (int64_t)0xFFFFFFFF;
  }
  const char* rank_of(int64_t tid) const {
    auto it = rank.find((uint32_t)tid);
    return it == rank.end() ? "" : it->second.c_str();
  }
  const char* name_of(int64_t tid) const {
    auto it = name.find((uint32_t)tid);
    return it == name.end() ? "" : it->second.c_str();
  }
};

static constexpr int64_t MAX_U32 = 0xFFFFFFFF;
static constexpr int64_t TAX_SLACK = 1000000;

static bool load_taxonomy(const std::string& dir, TaxTree& t) {
  std::string blob;
  if (!read_file_gz((dir + "/nodes.dmp").c_str(), blob)) return false;
  struct Node { int64_t tid, p; std::string rank; };
  std::vector<Node> nodes;
  int64_t mx = 0;
  size_t pos = 0;
  while (pos < blob.size()) {
    size_t e = blob.find('\n', pos);
    if (e == std::string::npos) e = blob.size();
    std::string line = blob.substr(pos, e - pos);
    pos = e + 1;
    // fields separated by "\t|\t": tid | parent | rank | ...
    if (line.find_first_not_of(" \t\r") == std::string::npos) continue;
    int64_t tid = strtoll(line.c_str(), nullptr, 10);
    size_t f1 = line.find("\t|", 0);
    if (f1 == std::string::npos) continue;
    int64_t p = strtoll(line.c_str() + f1 + 2, nullptr, 10);
    size_t f2 = line.find("\t|", f1 + 2);
    if (f2 == std::string::npos) continue;
    size_t f3 = line.find("\t|", f2 + 2);
    std::string rk = line.substr(f2 + 2, (f3 == std::string::npos ? line.size() : f3) - f2 - 2);
    while (!rk.empty() && (rk.front() == '\t')) rk.erase(rk.begin());
    while (!rk.empty() && (rk.back() == '\t')) rk.pop_back();
    nodes.push_back({tid, p, rk});
    mx = std::max(mx, tid);
  }
  t.max_tid = mx + TAX_SLACK;
  t.parent.assign((size_t)t.max_tid + 1, MAX_U32);
  for (auto& nd : nodes) {
    t.parent[(size_t)nd.tid] = nd.p;
    t.rank[(uint32_t)nd.tid] = nd.rank;
  }
  t.parent[1] = MAX_U32;  // virtual roots (cly_mt.c:646-652)
  t.parent[0] = MAX_U32;
  t.rank[0] = "no rank";
  t.name[0] = "CLY_FAIL";
  blob.clear();
  if (!read_file_gz((dir + "/names.dmp").c_str(), blob)) return false;
  pos = 0;
  while (pos < blob.size()) {
    size_t e = blob.find('\n', pos);
    if (e == std::string::npos) e = blob.size();
    std::string line = blob.substr(pos, e - pos);
    pos = e + 1;
    if (line.find_first_not_of(" \t\r") == std::string::npos) continue;
    // fields split on '|': tid | name | unique | type
    size_t p1 = line.find('|');
    if (p1 == std::string::npos) continue;
    size_t p2 = line.find('|', p1 + 1);
    size_t p3 = line.find('|', p2 == std::string::npos ? p1 + 1 : p2 + 1);
    if (p3 == std::string::npos) continue;
    std::string ntype = line.substr(p3 + 1);
    if (ntype.rfind("\tscien", 0) != 0) continue;  // scientific name only
    int64_t tid = strtoll(line.c_str(), nullptr, 10);
    std::string nm = line.substr(p1 + 1, p2 - p1 - 1);
    while (!nm.empty() && nm.front() == '\t') nm.erase(nm.begin());
    while (!nm.empty() && nm.back() == '\t') nm.pop_back();
    if (nm.size() > 200) nm.resize(200);  // (cly_mt.c:628 buffer cap)
    t.name[(uint32_t)tid] = nm;
  }
  return true;
}

// ------------------------------------------------------- index loading ----
struct SoIndex {
  // owned storage for every IndexView pointer
  std::vector<uint8_t> codes;
  std::vector<int64_t> cum, rank64, hash13;
  std::vector<uint32_t> sa_uni, sa_off;
  std::vector<int64_t> uni_len_ext, reflist_ext;
  std::vector<int64_t> refpos_global;
  std::vector<int32_t> refpos_refid;
  std::vector<int64_t> ref_offset, ref_len;
  std::vector<std::string> ref_names;
  std::vector<uint8_t> ref_bin, ek0, ek1;
  std::vector<int32_t> q_mem, q_lv;
  IndexView ix{};
  TaxTree tax;
  bool has_tax = false;
  // per-thread_id buffer registry (thread2buff, cly_mt.c:1279-1307)
  std::mutex mu;
  struct RmBuff {
    int thread_num = 1;
    std::vector<Buff> buffs;
  };
  std::unordered_map<int, RmBuff> registry;
};

// exist-filter geometry ladder (set_ekmer_par, idx.c:966-982): recover
// (mask_bits, e-kmer length) from the bitmap byte size written in .exki
static bool ek_from_size(uint64_t sz, int& mask_bits, int& lek) {
  static const struct { uint64_t size; int bits, k; } ladder[] = {
      {0x8000000ull, 30, 16},   {0x10000000ull, 31, 17},
      {0x20000000ull, 32, 17},  {0x40000000ull, 33, 18},
      {0x80000000ull, 34, 18},  {0x100000000ull, 35, 19},
      {0x200000000ull, 36, 19}, {0x400000000ull, 37, 20},
  };
  for (auto& e : ladder)
    if (e.size == sz) { mask_bits = e.bits; lek = e.k; return true; }
  return false;
}

// MAPQ tables (calculate_MAPQ_TABLE, cly_mt.c:396-420); C double->int
// truncation, matching desamba_tpu/oracle/mapq.py
static void mapq_tables(int64_t l_ref, std::vector<int32_t>& q_mem,
                        std::vector<int32_t>& q_lv) {
  const double P_E = 0.15;
  double ref_pen = -10.0 * log((double)l_ref) / log(10.0);
  double match = -10.0 * log(0.25 / (1.0 - P_E)) / log(10.0);
  double mismatch = -10.0 * log(0.75 / P_E) / log(10.0);
  q_mem.resize(2000);
  for (int i = 0; i < 2000; i++)
    q_mem[i] = (int32_t)(ref_pen + i * match + 0.5);
  q_lv.resize(20 * 20);
  for (int j = 0; j < 20; j++)
    for (int i = 0; i < 20; i++) {
      int32_t v = (int32_t)((j - i) * match + i * mismatch + 0.5);
      if (j < 5) v += 15;
      q_lv[i * 20 + j] = std::max(v, -8);
    }
}

// load_idx + load_bwt (idx.c:1103-1160, bwt.c:68-104) -> flat engine arrays
// (the nibble unpack + prefix-count expansion of OracleIndex.__init__)
static SoIndex* load_so_index(const std::string& dir) {
  auto idx = std::make_unique<SoIndex>();
  const std::string pre = dir + "/deSAMBA";
  std::vector<uint8_t> b;
  // ---- .bwt: blocks, rank, hash13
  if (!read_file_raw(pre + ".bwt", b)) return nullptr;
  uint64_t byte_len = *at<uint64_t>(b, 0);
  size_t n_blk = byte_len / 168;  // 40B counts + 128B nibbles (bwt.c:33-41)
  int64_t codes_len = (int64_t)n_blk * 256;
  idx->codes.resize((size_t)codes_len);
  for (size_t blk = 0; blk < n_blk; blk++) {
    const uint8_t* nib = b.data() + 8 + blk * 168 + 40;
    uint8_t* dst = idx->codes.data() + blk * 256;
    for (int k = 0; k < 128; k++) {
      dst[2 * k] = nib[k] & 0xF;
      dst[2 * k + 1] = nib[k] >> 4;
    }
  }
  size_t off = 8 + byte_len;
  idx->rank64.resize(6);
  memcpy(idx->rank64.data(), b.data() + off, 40);
  idx->rank64[5] = idx->rank64[0] - 1;
  off += 40;
  const size_t HASH_N = (1ull << 26) + 1;
  idx->hash13.resize(HASH_N);
  for (size_t k = 0; k < HASH_N; k++)
    idx->hash13[k] = (int64_t)*at<uint64_t>(b, off + k * 8);
  // ---- .sa
  if (!read_file_raw(pre + ".sa", b)) return nullptr;
  uint64_t sa_n = *at<uint64_t>(b, 0);  // entry count (write_bwt, bwt.c:206)
  idx->sa_uni.resize(sa_n);
  idx->sa_off.resize(sa_n);
  for (uint64_t k = 0; k < sa_n; k++) {
    idx->sa_uni[k] = *at<uint32_t>(b, 8 + k * 8);
    idx->sa_off[k] = *at<uint32_t>(b, 8 + k * 8 + 4);
  }
  // ---- exist filter
  if (!read_file_raw(pre + ".exki", b)) return nullptr;
  uint64_t ek_size = *at<uint64_t>(b, 0);
  int mask_bits, lek;
  if (!ek_from_size(ek_size, mask_bits, lek)) return nullptr;
  if (!read_file_raw(pre + ".exk0", b)) return nullptr;
  idx->ek0.assign(b.begin(), b.end());
  if (!read_file_raw(pre + ".exk1", b)) return nullptr;
  idx->ek1.assign(b.begin(), b.end());
  // ---- .unv: unitig CSR (+ dummy, + load-time extra entry, idx.c:1124-1127)
  if (!read_file_raw(pre + ".unv", b)) return nullptr;
  uint64_t unv_n = *at<uint64_t>(b, 0);  // file count (N real + 1 dummy + 1)
  int64_t N = (int64_t)unv_n - 2;
  idx->uni_len_ext.resize(unv_n);
  idx->reflist_ext.resize(unv_n + 1);
  int64_t uni_len_sum = 0;
  for (uint64_t k = 0; k < unv_n; k++) {
    idx->reflist_ext[k] = *at<uint32_t>(b, 8 + k * 8);
    int64_t ul = (k + 1 < unv_n) ? *at<uint32_t>(b, 8 + k * 8 + 4) : 0;
    idx->uni_len_ext[k] = ul;
    if (k + 1 < unv_n) uni_len_sum += ul;
  }
  idx->reflist_ext[unv_n] =
      idx->reflist_ext[unv_n - 1] + 1 + idx->uni_len_ext[unv_n - 2];
  int64_t L = uni_len_sum + N;
  // ---- .ref_b / .ref_i / .ref_p
  if (!read_file_raw(pre + ".ref_b", b)) return nullptr;
  uint64_t rb_n = *at<uint64_t>(b, 0);
  idx->ref_bin.assign(b.begin() + 8, b.begin() + 8 + rb_n);
  if (!read_file_raw(pre + ".ref_i", b)) return nullptr;
  uint64_t nref = *at<uint64_t>(b, 0);
  off = 8;
  for (uint64_t k = 0; k < nref; k++) {
    const char* nm = (const char*)b.data() + off;
    idx->ref_names.emplace_back(nm, strnlen(nm, 128));
    idx->ref_len.push_back((int64_t)*at<uint64_t>(b, off + 128));
    idx->ref_offset.push_back((int64_t)*at<uint64_t>(b, off + 136));
    off += 144;
  }
  if (!read_file_raw(pre + ".ref_p", b)) return nullptr;
  uint64_t np = *at<uint64_t>(b, 0);
  idx->refpos_global.resize(np);
  idx->refpos_refid.resize(np);
  for (uint64_t k = 0; k < np; k++) {
    uint64_t v = *at<uint64_t>(b, 8 + k * 8);  // bitfield (idx.h:42-48)
    idx->refpos_global[k] = (int64_t)(v & ((1ull << 40) - 1));
    idx->refpos_refid[k] = (int32_t)((v >> 40) & ((1u << 23) - 1));
  }
  b.clear();
  b.shrink_to_fit();
  // ---- occ prefix tables: cum[c][r] = count of c in rows [0, r)
  int64_t stride = codes_len + 1;
  idx->cum.assign(6 * (size_t)stride, 0);
  for (int64_t r = 0; r < L; r++) {
    uint8_t c = idx->codes[(size_t)r];
    for (int cc = 0; cc < 6; cc++) {
      int64_t* row = idx->cum.data() + (size_t)cc * stride;
      row[r + 1] = row[r] + (c == cc);
    }
  }
  for (int cc = 0; cc < 6; cc++) {
    int64_t* row = idx->cum.data() + (size_t)cc * stride;
    for (int64_t r = L + 1; r <= codes_len; r++) row[r] = row[L];
  }
  mapq_tables((int64_t)idx->ref_bin.size() * 4, idx->q_mem, idx->q_lv);
  // ---- wire the IndexView
  IndexView& ix = idx->ix;
  ix.codes = idx->codes.data();
  ix.cum = idx->cum.data();
  ix.cum_stride = stride;
  ix.L = L;
  ix.codes_len = codes_len;
  ix.rank = idx->rank64.data();
  ix.hash13 = idx->hash13.data();
  ix.sa_uni = idx->sa_uni.data();
  ix.sa_off = idx->sa_off.data();
  ix.dollar_pos = N - 1;  // DOLLOR_POS fix-up (idx.c:1128)
  ix.uni_len = idx->uni_len_ext.data();
  ix.reflist = idx->reflist_ext.data();
  ix.n_unitig = N;
  ix.refpos_global = idx->refpos_global.data();
  ix.refpos_refid = idx->refpos_refid.data();
  ix.n_refpos = (int64_t)idx->refpos_global.size();
  ix.ref_offset = idx->ref_offset.data();
  ix.ref_len = idx->ref_len.data();
  ix.ref_bin = idx->ref_bin.data();
  ix.ref_total = (int64_t)idx->ref_bin.size() * 4;
  ix.ek0 = idx->ek0.data();
  ix.ek1 = idx->ek1.data();
  ix.ek_mask = (mask_bits >= 64) ? ~0ull : ((1ull << mask_bits) - 1);
  ix.ek_len = lek;
  ix.ek_single_base_max = (int)(0.8 * lek);  // (idx.c:965)
  ix.q_mem = idx->q_mem.data();
  ix.q_lv = idx->q_lv.data();
  ix.filter_min_length = 170;  // .so defaults (cly_mt.c:1257-1259)
  ix.filter_min_score = 64;
  ix.filter_min_score_lv3 = 74;
  idx->has_tax = load_taxonomy(dir, idx->tax);
  return idx.release();
}

// ------------------------------------------------------ SAM formatting ----
// output_one_result_sam, SAM_FULL flavor (cly_mt.c:229-327), mirroring
// desamba_tpu/oracle/driver.py::format_sam byte-for-byte
static void format_sam_full(const SoIndex& si, const FqRead& r,
                            const ReadResultC& res, std::string& out,
                            int max_sec_n = 5) {
  char buf[512];
  const char* qual = r.qual.c_str();
  if (res.hits.empty()) {
    out += r.name;
    snprintf(buf, sizeof(buf), "\t4\t*\t0\t0\t*\t*\t0\t0\t");
    out += buf;
    out += r.seq;
    out += '\t';
    out += qual;
    out += "\t\n";
    return;
  }
  uint32_t read_l = (uint32_t)r.seq.size();
  const ChainC& cs = res.hits[0];
  int flag = cs.direction ? 0 : 0x10;
  int32_t mapq_pri;
  if (res.hits.size() == 1 ||
      (uint32_t)(cs.sum_score - res.hits[1].sum_score) > 5)
    mapq_pri = 30;
  else
    mapq_pri = (int32_t)((uint32_t)(cs.sum_score - res.hits[1].sum_score) << 2);
  out += r.name;
  snprintf(buf, sizeof(buf), "\t%d\t%s\t%d\t%d\t%dS%dM%dS\t*\t0\t0\t", flag,
           si.ref_names[cs.ref_ID].c_str(), (int32_t)cs.t_st, mapq_pri,
           (int32_t)cs.q_st, (int32_t)(cs.q_ed - cs.q_st),
           (int32_t)(read_l - cs.q_ed));
  out += buf;
  out += r.seq;
  out += '\t';
  out += qual;
  snprintf(buf, sizeof(buf), "\tAS:i:%d\t\n", (int32_t)cs.sum_score);
  out += buf;
  for (int loop = 0; loop < 2; loop++) {
    for (size_t k = 1; k < res.hits.size(); k++) {
      const ChainC& c = res.hits[k];
      bool show = false;
      int fl = c.direction ? 0 : 0x10;
      int mapq = 0;
      if (loop == 0 && c.pri_index == 0) {
        show = true;
        fl += 0x800;
        mapq = std::min(30, mapq_pri);
      } else if (loop == 1 && c.pri_index > 0 && c.pri_index <= max_sec_n) {
        show = true;
        fl += 0x100;
      }
      if (!show) continue;
      char hs = loop == 0 ? 'H' : 'S';
      out += r.name;
      snprintf(buf, sizeof(buf),
               "\t%d\t%s\t%d\t%d\t%d%c%dM%d%c\t*\t0\t0\t*\t*\tAS:i:%d\t\n",
               fl, si.ref_names[c.ref_ID].c_str(), (int32_t)c.t_st, mapq,
               (int32_t)c.q_st, hs, (int32_t)(c.q_ed - c.q_st),
               (int32_t)(read_l - c.q_ed), hs, (int32_t)c.sum_score);
      out += buf;
    }
  }
}

// --------------------------------------------------------- meta parsing ----
struct RstLine {  // getOneSAM, engine flavor (cly_mt.c:687-813)
  std::string read_name;
  bool classified;
  int64_t tid;
  int64_t read_length;
  int mapq;
  int64_t score;  // always 0 on the engine path (cly_mt.c:754-775 tokenizer)
  std::string seq;
};

static void split_tabs(const std::string& line, std::vector<std::string>& f) {
  f.clear();
  size_t pos = 0;
  while (true) {
    size_t e = line.find('\t', pos);
    if (e == std::string::npos) { f.push_back(line.substr(pos)); break; }
    f.push_back(line.substr(pos, e - pos));
    pos = e + 1;
  }
}

static bool all_digits(const std::string& s) {
  if (s.empty()) return false;
  for (char c : s)
    if (c < '0' || c > '9') return false;
  return true;
}

static void parse_sam_engine(const char* text, size_t n,
                             std::vector<RstLine>& out) {
  size_t pos = 0;
  bool started = false;
  std::vector<std::string> f;
  while (pos < n) {
    size_t e = pos;
    while (e < n && text[e] != '\n') e++;
    std::string line(text + pos, e - pos);
    pos = e + 1;
    if (!started && !line.empty() && line[0] == '@') continue;
    started = true;
    if (line.empty()) continue;
    split_tabs(line, f);
    if (f.size() < 3) continue;
    RstLine r;
    r.read_name = f[0];
    r.seq = f.size() > 9 ? f[9] : "";
    r.read_length = (int64_t)r.seq.size();
    r.score = 0;
    if (!f[2].empty() && f[2][0] == '*') {
      r.classified = false;
      r.tid = 0;
      r.mapq = 0;
    } else {
      r.classified = true;
      r.mapq = f.size() > 4 ? atoi(f[4].c_str()) : 0;
      // tid from "tid|NNN|ref|..." (cly_mt.c:777-786)
      size_t p1 = f[2].find('|');
      r.tid = 0;
      if (p1 != std::string::npos) {
        size_t p2 = f[2].find('|', p1 + 1);
        std::string t = f[2].substr(p1 + 1, (p2 == std::string::npos ? f[2].size() : p2) - p1 - 1);
        if (all_digits(t)) r.tid = strtoll(t.c_str(), nullptr, 10);
      }
    }
    out.push_back(std::move(r));
  }
}

// ana_get_tid (cly_mt.c:902-961): resolve the read's tid among equal-score
// secondaries preferring the most specific lineage member; engine flavor
static int64_t ana_get_tid(const std::vector<RstLine>& rsts, size_t i,
                           const TaxTree& tax, size_t& next_i) {
  const RstLine& rst = rsts[i];
  if (!rst.classified) { next_i = i + 1; return 0; }
  int64_t tid = 0, score = 0;
  if (rst.tid <= tax.max_tid) { tid = rst.tid; score = rst.score; }
  size_t j = i + 1;
  while (true) {
    if (j >= rsts.size()) { next_i = j; return tid; }
    const RstLine& nxt = rsts[j];
    if (nxt.read_name != rst.read_name) break;
    if (score == 0) break;
    if (nxt.score != score) { j++; continue; }
    if (nxt.tid > tax.max_tid) { j++; continue; }
    int64_t p = nxt.tid;
    while (true) {
      if (p == tid) { tid = nxt.tid; break; }
      if (p < 1 || p == MAX_U32) break;
      p = tax.p_tid(p);
    }
    j++;
  }
  next_i = j;
  return tid;
}

// glibc-qsort permutation on n elements of elem_size bytes, comparator on
// original indices — exact tie-order parity with the reference's qsort calls
// (same approach as desamba_tpu/oracle/cqsort.py, here calling libc directly)
struct PermCtx {
  int (*cmp)(uint32_t, uint32_t, void*);
  void* user;
};
static thread_local PermCtx g_perm_ctx;
static int perm_cmp(const void* a, const void* b) {
  uint32_t ia = *(const uint32_t*)a;
  uint32_t ib = *(const uint32_t*)b;
  return g_perm_ctx.cmp(ia, ib, g_perm_ctx.user);
}
static std::vector<uint32_t> qsort_perm(size_t n, size_t elem_size,
                                        int (*cmp)(uint32_t, uint32_t, void*),
                                        void* user) {
  std::vector<uint32_t> out(n);
  if (n <= 1) {
    for (size_t i = 0; i < n; i++) out[i] = (uint32_t)i;
    return out;
  }
  std::vector<uint8_t> buf(n * elem_size, 0);
  for (size_t i = 0; i < n; i++) {
    uint32_t v = (uint32_t)i;
    memcpy(buf.data() + i * elem_size, &v, 4);
  }
  g_perm_ctx = {cmp, user};
  qsort(buf.data(), n, elem_size, perm_cmp);
  for (size_t i = 0; i < n; i++)
    memcpy(&out[i], buf.data() + i * elem_size, 4);
  return out;
}

// printf "%f" of a float32 (the reference prints float rates with %f)
static void fmt_f32(float x, std::string& out) {
  char buf[64];
  snprintf(buf, sizeof(buf), "%f", (double)x);
  out += buf;
}

// species type of a leaf (ana_meta_loop_fprint, cly_mt.c:869-892)
static const char* species_type_of(int64_t tid, const TaxTree& tax) {
  if (tid == 0 || tid == 1) return "no_match";
  int64_t n = tid;
  while (n != MAX_U32) {
    if (n == 9606) return "human";
    if (n == 33208 || n == 33090) return "animal_and_plant";
    n = tax.p_tid(n);
  }
  return "microbe";
}

// the .so meta_analysis core + post-processing (cly_mt.c:1083-1235,
// 1329-1413), mirroring desamba_tpu/analysis/meta.py::meta_analysis
static void meta_analysis_impl(const SoIndex& si, const char* input,
                               size_t input_n, int flag,
                               uint64_t max_snapshot_len, std::string& report,
                               std::string& snapshot, bool& has_snapshot) {
  const TaxTree& tax = si.tax;
  std::vector<RstLine> rsts;
  parse_sam_engine(input, input_n, rsts);
  report.clear();
  snapshot.clear();
  has_snapshot = false;
  if (rsts.empty()) return;
  // human snapshot: concatenated SEQ of human-tid reads (cly_mt.c:1121-1123)
  for (auto& r : rsts) {
    if (!r.seq.empty() && r.seq[0] != '*' &&
        (r.tid == 9606 || r.tid == 63221 || r.tid == 741158)) {
      if (snapshot.size() < max_snapshot_len)
        snapshot += r.seq;
      has_snapshot = true;
    }
  }
  if (snapshot.size() > max_snapshot_len) snapshot.resize(max_snapshot_len);
  // per-read weights
  std::map<int64_t, uint64_t> node_count;
  uint64_t total_weight = 0;
  size_t i = 0;
  while (i < rsts.size()) {
    uint64_t weight = ((flag & 1) == 0) ? 1 : (uint64_t)rsts[i].read_length;
    total_weight += weight;
    size_t ni;
    int64_t tid = ana_get_tid(rsts, i, tax, ni);
    i = ni;
    node_count[tid] += weight;
  }
  // counts in glibc-qsort order: ascending-tid scan, then qsort on 16-byte
  // elements with the 0/1 "a < b" comparator (cmp_count_sort)
  struct Item { int64_t tid; uint64_t w; };
  std::vector<Item> items;
  for (auto& kv : node_count)
    if (kv.second != 0) items.push_back({kv.first, kv.second});
  auto cmp_count = [](uint32_t a, uint32_t b, void* u) -> int {
    auto* v = (std::vector<Item>*)u;
    return (*v)[a].w < (*v)[b].w ? 1 : 0;
  };
  auto perm = qsort_perm(items.size(), 16, cmp_count, &items);
  // tree weights + ordered child lists (cly_mt.c:1192-1222)
  std::unordered_map<int64_t, uint64_t> weight;
  std::unordered_map<int64_t, std::vector<int64_t>> children;
  for (uint32_t k : perm) {
    int64_t c = items[k].tid;
    uint64_t w = items[k].w;
    while (true) {
      int64_t p = tax.p_tid(c);
      weight[c] += w;
      if (p == MAX_U32) break;
      auto& kids = children[p];
      if (std::find(kids.begin(), kids.end(), c) == kids.end())
        kids.push_back(c);
      c = p;
    }
  }
  // leaf report lines from roots 0 (CLY_FAIL) and 1 (cly_mt.c:1228-1229)
  struct Line { std::string type, sp; double rate; std::string rate_s; };
  std::vector<Line> lines;
  std::function<void(int64_t)> rec = [&](int64_t node) {
    auto it = weight.find(node);
    if (it == weight.end() || it->second == 0) return;
    // f32(f32(w) / total): weight to float32, exact-double divide, round
    float rate = total_weight
        ? (float)((double)(float)it->second / (double)total_weight)
        : 0.0f;
    auto ch = children.find(node);
    if (ch != children.end() && !ch->second.empty()) {
      for (int64_t c : ch->second) rec(c);
    } else {
      Line ln;
      ln.type = species_type_of(node, tax);
      ln.sp = std::string(tax.name_of(node)) + "|" + tax.rank_of(node);
      fmt_f32(rate, ln.rate_s);
      ln.rate = atof(ln.rate_s.c_str());  // text round-trip like the C
      lines.push_back(std::move(ln));
    }
  };
  rec(0);
  rec(1);
  // post-process (cly_mt.c:1343-1411): no_match gate, renormalize, top-3
  double no_match_rate = 0.0;
  std::vector<Line> results;
  for (auto& ln : lines) {
    if (ln.type == "no_match")
      no_match_rate = (double)(float)(no_match_rate + ln.rate);
    else
      results.push_back(std::move(ln));
  }
  if (no_match_rate > 0.95) {
    report = "no_match\tnull|null\tnull\t0\n";
    return;
  }
  for (auto& r : results)
    r.rate = (double)(float)(r.rate / (double)(float)(1.0 - no_match_rate));
  auto cmp_rate = [](uint32_t a, uint32_t b, void* u) -> int {
    auto* v = (std::vector<Line>*)u;
    double ra = (*v)[a].rate, rb = (*v)[b].rate;
    return ra > rb ? -1 : (ra < rb ? 1 : 0);
  };
  auto p2 = qsort_perm(results.size(), 772 /* sizeof(MetaRST) */, cmp_rate,
                       &results);
  for (size_t k = 0; k < p2.size(); k++) {
    const Line& r = results[p2[k]];
    if (k < 3 || (r.type == "human" && r.rate > 0.05)) {
      report += r.type;
      report += '\t';
      report += r.sp;
      report += "\tnull\t";
      fmt_f32((float)r.rate, report);
      report += '\n';
    }
  }
}

// ------------------------------------------------------ classify driver ----
// read_classify_core (cly_mt.c:1041-1081): batch loop with the reference's
// batch geometry (N_NEEDED=5000 reads / 10 MB, cly_mt.c:22-23), reads
// striped over thread_num workers (kt_for analog), SAM_FULL output
static void classify_to_sam(SoIndex& si, SoIndex::RmBuff& rb,
                            const std::vector<FqRead>& reads,
                            std::string& out) {
  int T = rb.thread_num;
  size_t b0 = 0;
  while (b0 < reads.size()) {
    size_t b1 = b0;
    int64_t bytes = 0;
    while (b1 < reads.size() && (b1 - b0) < 5000 && bytes < 10000000) {
      bytes += (int64_t)reads[b1].seq.size();
      b1++;
    }
    size_t nb = b1 - b0;
    std::vector<ReadResultC> res(nb);
    std::vector<uint8_t> aborted(nb, 0);
    auto work = [&](int w) {
      bool ab = false;
      for (size_t k = (size_t)w; k < nb; k += (size_t)T) {
        const FqRead& r = reads[b0 + k];
        classify_one(si.ix, rb.buffs[(size_t)w],
                     (const uint8_t*)r.seq.data(), (int)r.seq.size(), res[k],
                     &ab);
        aborted[k] = ab ? 1 : 0;
      }
    };
    if (T == 1) {
      work(0);
    } else {
      std::vector<std::thread> th;
      for (int w = 0; w < T; w++) th.emplace_back(work, w);
      for (auto& t : th) t.join();
    }
    for (size_t k = 0; k < nb; k++) {
      if (aborted[k]) continue;  // reads where the reference binary crashes
      format_sam_full(si, reads[b0 + k], res[k], out);
    }
    b0 = b1;
  }
}

static SoIndex::RmBuff& find_buff(SoIndex& si, int thread_id, int thread_num) {
  // find_and_init_buff_for_thread_mutex (cly_mt.c:1279-1307)
  std::lock_guard<std::mutex> lk(si.mu);
  auto it = si.registry.find(thread_id);
  if (it != si.registry.end() &&
      (thread_num == -1 || it->second.thread_num == thread_num))
    return it->second;
  auto& rb = si.registry[thread_id];
  rb.thread_num = thread_num <= 0 ? 1 : thread_num;
  rb.buffs.assign((size_t)rb.thread_num, Buff{});
  return rb;
}

static char* dup_out(const std::string& s, uint64_t* n) {
  char* p = (char*)malloc(s.size() + 1);
  memcpy(p, s.data(), s.size());
  p[s.size()] = 0;
  if (n) *n = s.size();
  return p;
}

}  // namespace

// ------------------------------------------------------------- C API ----
extern "C" {

// desamba.h:10 — load the 10-file index directory (+ nodes.dmp/names.dmp)
void load_index(void** idx, const char* dirPath) {
  *idx = load_so_index(dirPath);
}

// desamba.h:23 — classify FASTQ (path when input_n == -1, else in-memory
// buffer of input_n bytes) into a malloc'd SAM_FULL string
void read_classify(void* idx, char* input, uint64_t input_n, char** output,
                   uint64_t* output_n, int thread_id, int thread_num) {
  auto* si = (SoIndex*)idx;
  std::string blob;
  const char* data = input;
  size_t n = (size_t)input_n;
  if (input_n == (uint64_t)-1) {
    if (!read_file_gz(input, blob)) {
      *output = dup_out("", output_n);
      return;
    }
    data = blob.data();
    n = blob.size();
  }
  if (n == 0) {  // empty-input graceful path (cly_mt.c:1310-1313)
    *output = dup_out("", output_n);
    return;
  }
  std::vector<FqRead> reads;
  parse_fastx(data, n, reads);
  auto& rb = find_buff(*si, thread_id, thread_num);
  std::string out;
  classify_to_sam(*si, rb, reads, out);
  *output = dup_out(out, output_n);
}

// desamba.h:45 — abundance report + human snapshot from a SAM_FULL string
void meta_analysis(void* idx, char* input, uint64_t input_n, char** output,
                   uint64_t* output_n, int thread_id, int flag,
                   uint64_t max_snapshot_len, char** human_snapshot,
                   uint64_t* human_snapshot_n) {
  auto* si = (SoIndex*)idx;
  find_buff(*si, thread_id, -1);
  if (input_n == 0 || input == nullptr) {  // (cly_mt.c:1331-1336)
    *output = dup_out("", output_n);
    if (human_snapshot) *human_snapshot = nullptr;
    if (human_snapshot_n) *human_snapshot_n = 0;
    return;
  }
  std::string report, snapshot;
  bool has_snap = false;
  meta_analysis_impl(*si, input, (size_t)input_n, flag, max_snapshot_len,
                     report, snapshot, has_snap);
  *output = dup_out(report, output_n);
  if (human_snapshot) {
    *human_snapshot = has_snap ? dup_out(snapshot, human_snapshot_n) : nullptr;
    if (!has_snap && human_snapshot_n) *human_snapshot_n = 0;
  }
}

// convenience for hosts that want to free with the library's allocator
void free_index(void* idx) { delete (SoIndex*)idx; }

}  // extern "C"
