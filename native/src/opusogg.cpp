// Ogg/Opus encoder: 16-bit mono PCM → .ogg bytes, no ffmpeg.
//
// Native replacement for the reference's PyAV→libopus path
// (reference: matcha/inference.py:300-320 — mono 48 kbps opus in ogg).
// libopus is dlopen'ed by soname (no dev headers needed); the Ogg
// encapsulation (RFC 3533 pages + RFC 7845 OpusHead/OpusTags) is written
// directly — it is a simple lacing + CRC32 page format.
//
// C API (ctypes-friendly):
//   mtpu_opus_ogg_encode(pcm, n, sample_rate, bitrate, &out, &out_len) -> 0/-err
//   mtpu_opus_ogg_free(out)

#include <cstdarg>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <string>
#include <vector>

namespace {

// ---- minimal libopus ABI (stable since 1.0) -----------------------------
typedef struct OpusEncoder OpusEncoder;
constexpr int OPUS_APPLICATION_AUDIO = 2049;
constexpr int OPUS_SET_BITRATE = 4002;
constexpr int OPUS_GET_LOOKAHEAD = 4027;

struct OpusLib {
  OpusEncoder* (*create)(int32_t, int, int, int*);
  int32_t (*encode)(OpusEncoder*, const int16_t*, int, unsigned char*, int32_t);
  int (*ctl)(OpusEncoder*, int, ...);
  void (*destroy)(OpusEncoder*);
  bool ok = false;
};

OpusLib load_opus() {
  static OpusLib lib = [] {
    OpusLib l{};
    void* h = dlopen("libopus.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libopus.so", RTLD_NOW | RTLD_GLOBAL);
    if (!h) return l;
    l.create = (OpusEncoder * (*)(int32_t, int, int, int*)) dlsym(h, "opus_encoder_create");
    l.encode = (int32_t(*)(OpusEncoder*, const int16_t*, int, unsigned char*, int32_t))
        dlsym(h, "opus_encode");
    l.ctl = (int (*)(OpusEncoder*, int, ...))dlsym(h, "opus_encoder_ctl");
    l.destroy = (void (*)(OpusEncoder*))dlsym(h, "opus_encoder_destroy");
    l.ok = l.create && l.encode && l.ctl && l.destroy;
    return l;
  }();
  return lib;
}

// ---- Ogg page writer (RFC 3533) -----------------------------------------
uint32_t ogg_crc(const uint8_t* data, size_t len) {
  // CRC-32, poly 0x04c11db7, no reflection, init/xorout 0
  static uint32_t table[256];
  static bool init = [] {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t r = i << 24;
      for (int j = 0; j < 8; ++j)
        r = (r & 0x80000000u) ? (r << 1) ^ 0x04c11db7u : (r << 1);
      table[i] = r;
    }
    return true;
  }();
  (void)init;
  uint32_t crc = 0;
  for (size_t i = 0; i < len; ++i)
    crc = (crc << 8) ^ table[((crc >> 24) & 0xff) ^ data[i]];
  return crc;
}

void put_le(std::vector<uint8_t>& v, uint64_t x, int bytes) {
  for (int i = 0; i < bytes; ++i) v.push_back((x >> (8 * i)) & 0xff);
}

struct OggWriter {
  std::vector<uint8_t> out;
  uint32_t serial = 0x6d617463;  // 'matc'
  uint32_t pageno = 0;

  void page(const std::vector<std::vector<uint8_t>>& packets, uint64_t granule,
            bool bos, bool eos) {
    std::vector<uint8_t> lacing;
    std::vector<uint8_t> body;
    for (const auto& p : packets) {
      size_t rem = p.size();
      while (true) {
        uint8_t seg = rem >= 255 ? 255 : (uint8_t)rem;
        lacing.push_back(seg);
        rem -= seg;
        if (seg < 255) break;
      }
      body.insert(body.end(), p.begin(), p.end());
    }
    std::vector<uint8_t> pg;
    pg.insert(pg.end(), {'O', 'g', 'g', 'S', 0});
    pg.push_back((bos ? 2 : 0) | (eos ? 4 : 0));
    put_le(pg, granule, 8);
    put_le(pg, serial, 4);
    put_le(pg, pageno++, 4);
    put_le(pg, 0, 4);  // CRC placeholder
    pg.push_back((uint8_t)lacing.size());
    pg.insert(pg.end(), lacing.begin(), lacing.end());
    pg.insert(pg.end(), body.begin(), body.end());
    uint32_t crc = ogg_crc(pg.data(), pg.size());
    pg[22] = crc & 0xff;
    pg[23] = (crc >> 8) & 0xff;
    pg[24] = (crc >> 16) & 0xff;
    pg[25] = (crc >> 24) & 0xff;
    out.insert(out.end(), pg.begin(), pg.end());
  }
};

}  // namespace

extern "C" {

// Returns 0 on success; *out is malloc'd (free with mtpu_opus_ogg_free).
int mtpu_opus_ogg_encode(const int16_t* pcm, int64_t n_samples,
                         int32_t sample_rate, int32_t bitrate,
                         uint8_t** out, int64_t* out_len) {
  OpusLib lib = load_opus();
  if (!lib.ok) return -1;
  if (sample_rate != 8000 && sample_rate != 12000 && sample_rate != 16000 &&
      sample_rate != 24000 && sample_rate != 48000)
    return -2;  // opus-valid input rates only

  int err = 0;
  OpusEncoder* enc = lib.create(sample_rate, 1, OPUS_APPLICATION_AUDIO, &err);
  if (!enc || err != 0) return -3;
  lib.ctl(enc, OPUS_SET_BITRATE, (int32_t)bitrate);
  int32_t lookahead = 0;
  lib.ctl(enc, OPUS_GET_LOOKAHEAD, &lookahead);
  // granule positions are in 48 kHz units (RFC 7845 §4)
  const int gran_per_in = 48000 / sample_rate;
  const uint16_t pre_skip = (uint16_t)(lookahead * gran_per_in);

  OggWriter ogg;

  // OpusHead (own page, BOS)
  std::vector<uint8_t> head;
  head.insert(head.end(), {'O', 'p', 'u', 's', 'H', 'e', 'a', 'd', 1, 1});
  put_le(head, pre_skip, 2);
  put_le(head, (uint32_t)sample_rate, 4);
  put_le(head, 0, 2);  // output gain
  head.push_back(0);   // mapping family
  ogg.page({head}, 0, true, false);

  // OpusTags (own page)
  std::vector<uint8_t> tags;
  tags.insert(tags.end(), {'O', 'p', 'u', 's', 'T', 'a', 'g', 's'});
  const char* vendor = "matcha-tts-24k-tpu";
  put_le(tags, strlen(vendor), 4);
  tags.insert(tags.end(), vendor, vendor + strlen(vendor));
  put_le(tags, 0, 4);  // no comments
  ogg.page({tags}, 0, false, false);

  // audio: 20 ms frames
  const int frame = sample_rate / 50;
  std::vector<int16_t> buf(frame);
  std::vector<uint8_t> packet(4000);
  std::vector<std::vector<uint8_t>> pending;
  uint64_t granule = 0;
  const int PACKETS_PER_PAGE = 50;  // ~1 s pages

  int64_t pos = 0;
  while (pos < n_samples) {
    int64_t take = n_samples - pos;
    if (take > frame) take = frame;
    memcpy(buf.data(), pcm + pos, take * sizeof(int16_t));
    if (take < frame)
      memset(buf.data() + take, 0, (frame - take) * sizeof(int16_t));
    int32_t n = lib.encode(enc, buf.data(), frame, packet.data(),
                           (int32_t)packet.size());
    if (n < 0) {
      lib.destroy(enc);
      return -4;
    }
    pending.emplace_back(packet.begin(), packet.begin() + n);
    granule += (uint64_t)frame * gran_per_in;
    pos += take;
    bool last = pos >= n_samples;
    if ((int)pending.size() >= PACKETS_PER_PAGE || last) {
      ogg.page(pending, granule + pre_skip, false, last);
      pending.clear();
    }
  }
  lib.destroy(enc);

  *out_len = (int64_t)ogg.out.size();
  *out = (uint8_t*)malloc(ogg.out.size());
  if (!*out) return -5;
  memcpy(*out, ogg.out.data(), ogg.out.size());
  return 0;
}

void mtpu_opus_ogg_free(uint8_t* p) { free(p); }

}  // extern "C"
