// Native TSV region-feature reader: the data-loader hot path.
//
// The reference's hot loop decodes base64 region features per sample in
// Python workers (ref:alad/dataset.py:317-324 via oscar/utils/tsv_file.py).
// This C library does the seek + read + field-split + base64 -> float32
// decode in one pass into a caller-provided buffer, exposed to Python via
// ctypes (aladin_tpu/io/native.py). It also builds .lineidx sidecars.
//
// Build: make -C native   (produces libaladin_io.so)

#include <fcntl.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// base64
// ---------------------------------------------------------------------------

static int8_t B64_LUT[256];
static bool b64_init_done = false;

static void b64_init() {
  if (b64_init_done) return;
  memset(B64_LUT, -1, sizeof(B64_LUT));
  const char* alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  for (int i = 0; i < 64; ++i) B64_LUT[(uint8_t)alphabet[i]] = (int8_t)i;
  b64_init_done = true;
}

// Decode base64 `src[0..n)` into `dst` (caller-sized). Returns bytes written,
// or -1 on invalid input. Fast path: clean single-line payload (no inner
// whitespace), 4 chars -> 3 bytes unrolled.
int64_t aladin_b64_decode(const char* src, int64_t n, uint8_t* dst,
                          int64_t dst_cap) {
  b64_init();
  while (n > 0 && (src[n - 1] == '=' || src[n - 1] == '\n' || src[n - 1] == '\r'))
    --n;
  int64_t blocks = n / 4;
  int64_t need = blocks * 3 + (n % 4 ? (n % 4) * 3 / 4 : 0);
  if (need > dst_cap) return -1;
  const uint8_t* s = (const uint8_t*)src;
  uint8_t* d = dst;
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    int8_t v0 = B64_LUT[s[i]], v1 = B64_LUT[s[i + 1]];
    int8_t v2 = B64_LUT[s[i + 2]], v3 = B64_LUT[s[i + 3]];
    if ((v0 | v1 | v2 | v3) < 0) return -1;
    uint32_t acc = ((uint32_t)v0 << 18) | ((uint32_t)v1 << 12) |
                   ((uint32_t)v2 << 6) | (uint32_t)v3;
    d[0] = (uint8_t)(acc >> 16);
    d[1] = (uint8_t)(acc >> 8);
    d[2] = (uint8_t)acc;
    d += 3;
  }
  // tail (2 or 3 chars after '=' stripping)
  if (i < n) {
    uint32_t acc = 0;
    int bits = 0;
    for (; i < n; ++i) {
      int8_t v = B64_LUT[s[i]];
      if (v < 0) return -1;
      acc = (acc << 6) | (uint32_t)v;
      bits += 6;
      if (bits >= 8) {
        bits -= 8;
        *d++ = (uint8_t)((acc >> bits) & 0xFF);
      }
    }
  }
  return (int64_t)(d - dst);
}

// ---------------------------------------------------------------------------
// lineidx
// ---------------------------------------------------------------------------

// Scan a file and write "<offset>\n" per line into `idx_path`.
// Returns number of lines, or -1 on IO error.
int64_t aladin_build_lineidx(const char* tsv_path, const char* idx_path) {
  FILE* f = fopen(tsv_path, "rb");
  if (!f) return -1;
  FILE* o = fopen(idx_path, "w");
  if (!o) {
    fclose(f);
    return -1;
  }
  std::vector<char> buf(1 << 20);
  int64_t pos = 0, line_start = 0, count = 0;
  size_t got;
  while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; ++i) {
      if (pos == line_start) {
        fprintf(o, "%lld\n", (long long)line_start);
        ++count;
      }
      if (buf[i] == '\n') line_start = pos + 1;
      ++pos;
    }
  }
  fclose(f);
  fclose(o);
  return count;
}

// ---------------------------------------------------------------------------
// row reader
// ---------------------------------------------------------------------------

// Reads go through pread on a raw fd: no shared file position and no shared
// scratch buffer, so one handle is safe from ANY number of loader threads
// (and from forked children - pread carries its own offset). The reference's
// reader needs a pid-aware reopen for fork safety (ref:oscar/utils/
// tsv_file.py:77-85); pread makes that machinery unnecessary.
struct AladinTsv {
  int fd;
  int64_t file_size;
  std::vector<int64_t> offsets;
};

void* aladin_tsv_open(const char* tsv_path, const char* idx_path) {
  int fd = open(tsv_path, O_RDONLY);
  if (fd < 0) return nullptr;
  FILE* idx = fopen(idx_path, "r");
  if (!idx) {
    close(fd);
    return nullptr;
  }
  auto* t = new AladinTsv();
  t->fd = fd;
  t->file_size = lseek(fd, 0, SEEK_END);
  long long off;
  while (fscanf(idx, "%lld", &off) == 1) t->offsets.push_back(off);
  fclose(idx);
  return t;
}

int64_t aladin_tsv_num_rows(void* handle) {
  return handle ? (int64_t)((AladinTsv*)handle)->offsets.size() : -1;
}

void aladin_tsv_close(void* handle) {
  if (!handle) return;
  auto* t = (AladinTsv*)handle;
  close(t->fd);
  delete t;
}

// Read row `idx`, take the LAST tab-separated field as base64-encoded
// float32 data, decode into `out` (capacity `out_cap` floats). `num_boxes`
// receives field[1] parsed as int. Returns number of floats written, or -1.
// Thread-safe: pread + a thread_local line buffer.
int64_t aladin_tsv_read_features(void* handle, int64_t idx, float* out,
                                 int64_t out_cap, int64_t* num_boxes) {
  if (!handle) return -1;
  auto* t = (AladinTsv*)handle;
  if (idx < 0 || (size_t)idx >= t->offsets.size()) return -1;
  int64_t start = t->offsets[idx];
  int64_t end = ((size_t)(idx + 1) < t->offsets.size())
                    ? t->offsets[idx + 1]
                    : t->file_size;
  if (end <= start) return -1;

  static thread_local std::string line;
  line.resize(end - start);
  int64_t got = 0;
  while (got < (int64_t)line.size()) {
    ssize_t n = pread(t->fd, &line[got], line.size() - got, start + got);
    if (n <= 0) return -1;
    got += n;
  }
  while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
    line.pop_back();

  // split: field[1] = num_boxes, last field = base64 payload
  size_t tab1 = line.find('\t');
  if (tab1 == std::string::npos) return -1;
  size_t tab2 = line.find('\t', tab1 + 1);
  if (tab2 == std::string::npos) return -1;
  *num_boxes = strtoll(line.c_str() + tab1 + 1, nullptr, 10);
  size_t last_tab = line.rfind('\t');
  const char* payload = line.c_str() + last_tab + 1;
  int64_t payload_len = (int64_t)(line.size() - last_tab - 1);

  int64_t bytes = aladin_b64_decode(payload, payload_len, (uint8_t*)out,
                                    out_cap * (int64_t)sizeof(float));
  if (bytes < 0 || bytes % 4 != 0) return -1;
  return bytes / 4;
}

}  // extern "C"
