// Native batch loader: multi-threaded .npy feature reading + padded batch
// assembly — the byte-moving hot path of the input pipeline.
//
// The reference delegates this work to torch DataLoader worker *processes*
// (dataloader.py:513-532) with per-item np.load + per-batch pad/stack in
// collate_fn (dataloader.py:233-276,507-510). Here one C call fills a
// preallocated [N, max_t, E] rectangle with the pad mask, in parallel, with
// no Python-object churn. Semantics mirror vct_tpu.data.collate.fit_time_axis
// and datasets.load_feature exactly:
//   * arrays stored (T, E) or (E, T); oriented so dim0 <= dim1 (the
//     reference's transpose rule, dataloader.py:382-385),
//   * leading/trailing singleton dims squeezed,
//   * T > max_t: uniform subsample via trunc(linspace(0, T-1, max_t))
//     (numpy linspace->astype(int32) truncates),
//   * rows >= T zero-padded, mask True=pad (dataloader.py:246).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <mutex>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  int64_t rows = 0;   // dim0 as stored
  int64_t cols = 0;   // dim1 as stored
  bool fortran = false;
  int esize = 4;      // element bytes: 2 (<f2), 4 (<f4), 8 (<f8); all -> f32
  int64_t payload_off = 0;
};

// IEEE 754 binary32 -> binary16, round-to-nearest-even (matches
// np.float32.astype(np.float16)). Used by the f16-output batch path that
// quarters host->device transfer bytes vs float64/float32 features.
uint16_t float_to_half(float f) {
  uint32_t x;
  memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  uint32_t exp = (x >> 23) & 0xFFu;
  uint32_t man = x & 0x7FFFFFu;
  if (exp == 255)  // inf/nan (keep nan non-zero mantissa)
    return (uint16_t)(sign | 0x7C00u | (man ? (0x200u | (man >> 13)) : 0));
  int e = (int)exp - 127 + 15;  // half-biased exponent
  if (e >= 31) return (uint16_t)(sign | 0x7C00u);  // overflow -> inf
  if (e <= 0) {                                    // subnormal or zero
    if (e < -10) return (uint16_t)sign;            // underflows to +-0
    uint32_t m = man | 0x800000u;
    int shift = 14 - e;
    uint32_t hman = m >> shift;
    uint32_t rem = m & ((1u << shift) - 1);
    uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (hman & 1))) hman++;
    return (uint16_t)(sign | hman);  // carry into exponent is correct
  }
  uint32_t hman = man >> 13;
  uint32_t rem = man & 0x1FFFu;
  uint16_t h = (uint16_t)(sign | ((uint32_t)e << 10) | hman);
  if (rem > 0x1000u || (rem == 0x1000u && (h & 1))) h++;  // rne (carry ok)
  return h;
}

// IEEE 754 binary16 -> binary32 (matches np.float16.astype(np.float32))
float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t man = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) { bits = sign; }
    else {  // subnormal: normalize (value = man * 2^-24)
      int shift = 0;
      while (!(man & 0x400u)) { man <<= 1; shift++; }
      man &= 0x3FFu;
      bits = sign | ((uint32_t)(127 - 15 + 1 - shift) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  memcpy(&f, &bits, 4);
  return f;
}

// Parse an .npy v1.x/v2.x header. Returns empty string on success, else error.
std::string parse_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return "short read (magic)";
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return "bad magic";
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return "short read (hlen)";
    hlen = b[0] | (b[1] << 8);
    info->payload_off = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return "short read (hlen2)";
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    info->payload_off = 12 + hlen;
  }
  std::string hdr(hlen, '\0');
  if (fread(&hdr[0], 1, hlen, f) != hlen) return "short read (header)";

  auto find_val = [&](const char* key) -> std::string {
    size_t p = hdr.find(key);
    if (p == std::string::npos) return "";
    p = hdr.find(':', p);
    if (p == std::string::npos) return "";
    size_t q = p + 1;
    while (q < hdr.size() && hdr[q] == ' ') q++;
    size_t end = q;
    int depth = 0;
    while (end < hdr.size()) {
      char c = hdr[end];
      if (c == '(' || c == '[') depth++;
      if (c == ')' || c == ']') { if (depth == 0) break; depth--; if (depth == 0) { end++; break; } }
      if ((c == ',' || c == '}') && depth == 0) break;
      end++;
    }
    return hdr.substr(q, end - q);
  };

  std::string descr = find_val("'descr'");
  if (descr.find("<f4") != std::string::npos) info->esize = 4;
  else if (descr.find("<f8") != std::string::npos) info->esize = 8;
  else if (descr.find("<f2") != std::string::npos) info->esize = 2;
  else return "unsupported dtype " + descr + " (want <f2/<f4/<f8)";

  info->fortran = find_val("'fortran_order'").find("True") != std::string::npos;

  std::string shape = find_val("'shape'");
  std::vector<int64_t> dims;
  int64_t cur = -1;
  for (char c : shape) {
    if (c >= '0' && c <= '9') cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    else if (cur >= 0) { dims.push_back(cur); cur = -1; }
  }
  if (cur >= 0) dims.push_back(cur);
  // squeeze singleton dims (datasets.load_feature does np.squeeze)
  std::vector<int64_t> sq;
  for (int64_t d : dims) if (d != 1) sq.push_back(d);
  // 0-D/1-D after squeeze is an error, matching datasets.load_feature's
  // strictness — never silently promote (T,) to a single frame.
  if (sq.size() != 2) return "feature is not 2-D after squeeze";
  info->rows = sq[0];
  info->cols = sq[1];
  return "";
}

// Load one file into out[max_t * e] (float32, or float16 when half_out),
// mask[max_t]; returns error or "". The f16 output path matches
// "load -> float32 -> astype(float16)" numerics: f16-stored rows memcpy
// verbatim (f16->f32->f16 round-trips exactly), wider dtypes go through
// float then round-to-nearest-even.
std::string load_one(const char* path, int64_t max_t, int64_t e,
                     void* out_v, uint8_t* mask, int32_t* t_out,
                     bool half_out) {
  float* out = half_out ? nullptr : (float*)out_v;
  uint16_t* outh = half_out ? (uint16_t*)out_v : nullptr;
  FILE* f = fopen(path, "rb");
  if (!f) return std::string("cannot open ") + path;
  NpyInfo info;
  std::string err = parse_header(f, &info);
  if (!err.empty()) { fclose(f); return std::string(path) + ": " + err; }

  // orient (T, E): transpose when dim0 > dim1 (reference rule). fortran_order
  // flips the effective layout, which is the same as swapping dims.
  int64_t d0 = info.rows, d1 = info.cols;
  bool stored_te;  // payload laid out row-major as (T, E)?
  int64_t t, ecols;
  if (d0 > d1) { t = d1; ecols = d0; stored_te = false; }  // stored (E, T)
  else { t = d0; ecols = d1; stored_te = true; }
  if (info.fortran) stored_te = !stored_te;
  if (ecols != e) {
    fclose(f);
    char buf[256];
    snprintf(buf, sizeof buf, "%s: feature dim %lld != expected %lld",
             path, (long long)ecols, (long long)e);
    return buf;
  }

  int64_t n_elem = info.rows * info.cols;
  size_t esize = info.esize;
  std::vector<unsigned char> raw(n_elem * esize);
  if (fseek(f, (long)info.payload_off, SEEK_SET) != 0 ||
      fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return std::string(path) + ": short payload";
  }
  fclose(f);

  auto elem = [&](int64_t ti, int64_t ei) -> float {
    int64_t idx = stored_te ? ti * e + ei : ei * t + ti;
    switch (info.esize) {
      case 8: { double v; memcpy(&v, raw.data() + idx * 8, 8); return (float)v; }
      case 2: { uint16_t v; memcpy(&v, raw.data() + idx * 2, 2); return half_to_float(v); }
      default: { float v; memcpy(&v, raw.data() + idx * 4, 4); return v; }
    }
  };

  memset(out_v, 0, (half_out ? sizeof(uint16_t) : sizeof(float)) * max_t * e);
  int64_t keep = t <= max_t ? t : max_t;
  // uniform subsample when t > max_t, bit-exact with numpy:
  // np.linspace(0, t-1, max_t) computes y[i] = i * ((t-1)/(max_t-1)) with the
  // step rounded to double FIRST (and y[-1] = t-1 exactly); .astype truncates.
  double step = (max_t > 1) ? (double)(t - 1) / (double)(max_t - 1) : 0.0;
  for (int64_t i = 0; i < keep; i++) {
    int64_t ti = i;
    if (t > max_t) {
      ti = (i == max_t - 1) ? t - 1 : (int64_t)(step * (double)i);
    }
    if (!half_out && stored_te && info.esize == 4) {
      memcpy(out + i * e, raw.data() + ti * e * 4, e * 4);
    } else if (half_out && stored_te && info.esize == 2) {
      memcpy(outh + i * e, raw.data() + ti * e * 2, e * 2);
    } else if (half_out) {
      for (int64_t j = 0; j < e; j++)
        outh[i * e + j] = float_to_half(elem(ti, j));
    } else {
      for (int64_t j = 0; j < e; j++) out[i * e + j] = elem(ti, j);
    }
  }
  for (int64_t i = 0; i < max_t; i++) mask[i] = i >= keep ? 1 : 0;
  *t_out = (int32_t)keep;
  return "";
}

}  // namespace

extern "C" {

// Fill out[n, max_t, e] float32 + mask[n, max_t] uint8 (1=pad) from n .npy
// files in parallel. Returns 0 on success; on failure returns 1 and writes a
// message into err_buf.
static int load_padded_impl(const char** paths, int64_t n, int64_t max_t,
                            int64_t e, void* out, uint8_t* mask,
                            int32_t* lengths, int n_threads, char* err_buf,
                            int err_len, bool half_out) {
  std::atomic<int64_t> next(0);
  std::atomic<bool> failed(false);
  std::string first_err;
  std::mutex err_mu;
  int64_t out_stride = max_t * e * (half_out ? 2 : 4);

  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      std::string err = load_one(paths[i], max_t, e,
                                 (unsigned char*)out + i * out_stride,
                                 mask + i * max_t, lengths + i, half_out);
      if (!err.empty()) {
        std::lock_guard<std::mutex> lk(err_mu);
        if (!failed.exchange(true)) first_err = err;
      }
    }
  };

  int nt = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (nt > n) nt = (int)n;
  if (nt <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < nt; i++) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  if (failed.load()) {
    snprintf(err_buf, err_len, "%s", first_err.c_str());
    return 1;
  }
  return 0;
}

int nl_load_padded(const char** paths, int64_t n, int64_t max_t, int64_t e,
                   float* out, uint8_t* mask, int32_t* lengths,
                   int n_threads, char* err_buf, int err_len) {
  return load_padded_impl(paths, n, max_t, e, out, mask, lengths, n_threads,
                          err_buf, err_len, false);
}

// float16 output variant: quarters (vs f64) / halves (vs f32) the bytes the
// host ships to the device — the dominant e2e cost on narrow host->device
// links. f16-stored features are memcpy'd verbatim.
int nl_load_padded_f16(const char** paths, int64_t n, int64_t max_t, int64_t e,
                       uint16_t* out, uint8_t* mask, int32_t* lengths,
                       int n_threads, char* err_buf, int err_len) {
  return load_padded_impl(paths, n, max_t, e, out, mask, lengths, n_threads,
                          err_buf, err_len, true);
}

}  // extern "C"
