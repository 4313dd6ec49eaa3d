// Fuzz driver for the native host codec (codec.cpp).  The serving daemon
// (deepsee_tpu/server.py -> utils/images.py) feeds dsn_decode_* UNTRUSTED
// HTTP request bytes, so every byte-entry point must be memory-safe on
// arbitrary input.  Build with sanitizers and run via scripts/fuzz_codec.py:
//
//   make -C deepsee_tpu/native fuzz        # ASAN+UBSAN binary
//   ./fuzz_codec <seed_dir> <iterations> <work_dir>
//
// Deterministic: a fixed-seed xorshift RNG mutates the seed corpus
// (bit flips, byte splats, truncations, chunk duplication) and drives all
// entry points with randomized (including hostile) DsnOps.  Before each
// iteration the mutated input is written to <work_dir>/current.bin, so a
// sanitizer abort leaves the reproducer behind; a clean run removes it.
// Exit 0 = no sanitizer findings.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

// C ABI of codec.cpp (keep in sync with native/__init__.py DsnOps).
extern "C" {
typedef struct {
  int32_t center_crop;
  int32_t resize_w, resize_h;
  int32_t crop_x, crop_y;
  int32_t crop_w, crop_h;
  int32_t flip;
  int32_t resample;
  int32_t scaled_decode;
} DsnOps;

int32_t dsn_abi_version(void);
int32_t dsn_decode_image(const uint8_t*, int64_t, const DsnOps*, int32_t,
                         int32_t, float*);
int32_t dsn_decode_label(const uint8_t*, int64_t, const DsnOps*, int32_t,
                         int32_t, int32_t, int32_t*);
int32_t dsn_decode_u8(const uint8_t*, int64_t, const DsnOps*, int32_t, int32_t,
                      int32_t, uint8_t*);
int32_t dsn_probe(const uint8_t*, int64_t, int32_t*, int32_t*);
int64_t dsn_encode_png(const uint8_t*, int32_t, int32_t, int32_t, int32_t,
                       uint8_t*, int64_t);
}

namespace {

uint64_t g_rng = 0x243F6A8885A308D3ull;  // overridable via argv[4]

uint64_t next_u64() {
  g_rng ^= g_rng << 13;
  g_rng ^= g_rng >> 7;
  g_rng ^= g_rng << 17;
  return g_rng;
}

uint32_t rnd(uint32_t n) { return n ? next_u64() % n : 0; }

std::vector<uint8_t> read_file(const std::string& path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n > 0) {
    buf.resize(static_cast<size_t>(n));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  }
  std::fclose(f);
  return buf;
}

void mutate(std::vector<uint8_t>* data) {
  if (data->empty()) return;
  int n_mut = 1 + rnd(8);
  for (int m = 0; m < n_mut; m++) {
    switch (rnd(5)) {
      case 0: {  // bit flip
        size_t i = rnd(data->size());
        (*data)[i] ^= uint8_t{1} << rnd(8);
        break;
      }
      case 1: {  // byte splat (00/FF/random are all interesting)
        size_t i = rnd(data->size());
        uint8_t vals[3] = {0x00, 0xFF, static_cast<uint8_t>(next_u64())};
        (*data)[i] = vals[rnd(3)];
        break;
      }
      case 2:  // truncate
        data->resize(1 + rnd(data->size()));
        break;
      case 3: {  // duplicate a chunk (confuses length-framed formats)
        size_t at = rnd(data->size());
        size_t len = 1 + rnd(64);
        if (at + len > data->size()) len = data->size() - at;
        data->insert(data->begin() + at, data->begin() + at,
                     data->begin() + at + len);
        break;
      }
      case 4: {  // zero a range
        size_t at = rnd(data->size());
        size_t len = 1 + rnd(32);
        if (at + len > data->size()) len = data->size() - at;
        std::memset(data->data() + at, 0, len);
        break;
      }
    }
  }
}

int pick_dim() {
  // Mix of plausible, degenerate, and hostile values.  Bounds/overflow bugs
  // are size-generic, so legal dims stay small (iteration throughput);
  // the huge ones must be REJECTED by the guards, not worked through.
  const int32_t vals[] = {0,   1,  2,   7,       16,      32,        64,
                          128, 178, 257, 515,     -1,      -128,
                          1 << 30, 2147483647};
  return vals[rnd(sizeof(vals) / sizeof(vals[0]))];
}

DsnOps random_ops() {
  DsnOps ops;
  std::memset(&ops, 0, sizeof(ops));
  if (rnd(2)) ops.center_crop = pick_dim();
  if (rnd(2)) {
    ops.resize_w = pick_dim();
    ops.resize_h = pick_dim();
  }
  if (rnd(3) == 0) {
    ops.crop_x = pick_dim();
    ops.crop_y = pick_dim();
    ops.crop_w = pick_dim();
    ops.crop_h = pick_dim();
  }
  ops.flip = rnd(2);
  ops.resample = rnd(4) == 3 ? 7 : rnd(3);  // incl. an invalid enum value
  ops.scaled_decode = rnd(2);
  return ops;
}

// A "reasonable" ops/expect pair so the success path (full resample +
// normalize + memcpy) is exercised deeply, not just the error returns.
DsnOps sane_ops(int* ew, int* eh) {
  DsnOps ops;
  std::memset(&ops, 0, sizeof(ops));
  int target = 8 + rnd(120);
  ops.resize_w = target;
  ops.resize_h = target;
  ops.resample = rnd(3);
  ops.flip = rnd(2);
  ops.scaled_decode = rnd(4) == 0;
  *ew = target;
  *eh = target;
  return ops;
}

void drive(const std::vector<uint8_t>& data) {
  int32_t pw = 0, ph = 0;
  dsn_probe(data.data(), static_cast<int64_t>(data.size()), &pw, &ph);
  dsn_probe(nullptr, 0, &pw, &ph);  // empty HTTP body

  for (int round = 0; round < 3; round++) {
    int ew, eh;
    DsnOps ops;
    if (round == 0) {
      ops = sane_ops(&ew, &eh);
    } else {
      ops = random_ops();
      ew = 1 + rnd(256);
      eh = 1 + rnd(256);
    }
    size_t n = static_cast<size_t>(ew) * eh;
    std::vector<float> fimg(n * 3);
    std::vector<int32_t> lab(n);
    std::vector<uint8_t> u8(n * 3);
    dsn_decode_image(data.data(), static_cast<int64_t>(data.size()), &ops, ew,
                     eh, fimg.data());
    dsn_decode_label(data.data(), static_cast<int64_t>(data.size()), &ops, 18,
                     ew, eh, lab.data());
    dsn_decode_u8(data.data(), static_cast<int64_t>(data.size()), &ops, 3, ew,
                  eh, u8.data());
    dsn_decode_u8(data.data(), static_cast<int64_t>(data.size()), &ops, 1, ew,
                  eh, u8.data());
  }

  // encoder: trusted-ish input in production, but cheap to cover — random
  // small images, random level, and deliberately short output caps
  int w = 1 + rnd(64), h = 1 + rnd(64);
  int ch = rnd(2) ? 3 : 1;
  std::vector<uint8_t> px(static_cast<size_t>(w) * h * ch);
  for (auto& p : px) p = static_cast<uint8_t>(next_u64());
  int64_t cap = rnd(2) ? static_cast<int64_t>(px.size()) * 2 + 4096 : rnd(64);
  std::vector<uint8_t> out(static_cast<size_t>(cap > 0 ? cap : 1));
  dsn_encode_png(px.data(), w, h, ch, static_cast<int32_t>(rnd(12)) - 1,
                 out.data(), cap);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: fuzz_codec <seed_dir> <iterations> <work_dir> "
                 "[rng_seed]\n");
    return 2;
  }
  std::string seed_dir = argv[1];
  long iterations = std::atol(argv[2]);
  std::string work = argv[3];
  if (argc > 4) g_rng ^= std::strtoull(argv[4], nullptr, 10);

  // seeds are <seed_dir>/seed_000 ...; empty/missing entries are skipped
  // (stop after a few consecutive gaps so the scan stays bounded)
  std::vector<std::vector<uint8_t>> seeds;
  int misses = 0;
  for (int i = 0; i < 1000 && misses < 4; i++) {
    char name[64];
    std::snprintf(name, sizeof(name), "/seed_%03d", i);
    std::vector<uint8_t> s = read_file(seed_dir + name);
    if (s.empty()) {
      misses++;
      continue;
    }
    misses = 0;
    seeds.push_back(std::move(s));
  }
  if (seeds.empty()) {
    std::fprintf(stderr, "no seeds in %s\n", seed_dir.c_str());
    return 2;
  }
  std::fprintf(stderr, "fuzz_codec abi=%d seeds=%zu iters=%ld\n",
               dsn_abi_version(), seeds.size(), iterations);

  std::string repro = work + "/current.bin";
  for (long it = 0; it < iterations; it++) {
    std::vector<uint8_t> input = seeds[rnd(seeds.size())];
    if (rnd(8)) mutate(&input);  // 1/8 iterations drive the pristine seed
    FILE* f = std::fopen(repro.c_str(), "wb");
    if (f) {
      std::fwrite(input.data(), 1, input.size(), f);
      std::fclose(f);
    }
    drive(input);
    if (it && it % 10000 == 0) std::fprintf(stderr, "  %ld iters\n", it);
  }
  std::remove(repro.c_str());
  std::fprintf(stderr, "fuzz_codec: clean after %ld iterations\n", iterations);
  return 0;
}
