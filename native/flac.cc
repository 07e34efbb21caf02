// First-party FLAC decoder for the data layer.
//
// The training datasets (LibriSpeech / LibriLight / LibriHeavy) are FLAC and
// this image ships no libFLAC/libsndfile/ffmpeg, so the framework carries its
// own decoder: a single-file C++ implementation of the FLAC bitstream
// (STREAMINFO metadata, frame headers, constant/verbatim/fixed/LPC subframes,
// Rice/Rice2 residual partitions, wasted bits, stereo decorrelation), exposed
// through a minimal C ABI consumed via ctypes (edm_tts_tpu/data/native_flac.py).
//
// Windowed decode with real seeking: a [start, start+count) window first
// positions via the SEEKTABLE metadata block when present, else by a binary
// search over CRC-8-verified frame headers, then decodes only from the
// preceding frame boundary — a late window of an hours-long LibriLight file
// touches O(window) samples instead of O(file) (the reference gets this from
// sox/torchaudio seeking, edm_tts/datasets/librilight.py:82).
// edmflac_decode_stats exposes decoded-frame counters so callers/tests can
// assert the seek actually bounded the work.
//
// Build: g++ -O3 -shared -fPIC -o libedmflac.so flac.cc

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  bool at_end() const { return byte_pos >= size; }

  inline uint32_t read_bit() {
    if (byte_pos >= size) {
      error = true;
      return 0;
    }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) {
      bit_pos = 0;
      ++byte_pos;
    }
    return b;
  }

  inline uint64_t read_bits(int n) {
    uint64_t v = 0;
    // fast path: byte-aligned whole bytes
    while (n >= 8 && bit_pos == 0 && byte_pos < size) {
      v = (v << 8) | data[byte_pos++];
      n -= 8;
    }
    while (n > 0) {
      v = (v << 1) | read_bit();
      --n;
    }
    return v;
  }

  inline int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~(sign * 2 - 1)) : (int64_t)v;
  }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    // fast path over zero bytes
    while (!error) {
      if (byte_pos >= size) {
        error = true;
        return q;
      }
      uint8_t cur = (uint8_t)(data[byte_pos] << bit_pos);
      if (cur == 0) {
        q += 8 - bit_pos;
        ++byte_pos;
        bit_pos = 0;
        continue;
      }
      // find first set bit
      int lead = __builtin_clz((uint32_t)cur) - 24;  // 0..7
      q += lead;
      bit_pos += lead + 1;
      if (bit_pos >= 8) {
        bit_pos -= 8;
        ++byte_pos;
      }
      return q;
    }
    return q;
  }

  void align() {
    if (bit_pos != 0) {
      bit_pos = 0;
      ++byte_pos;
    }
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint32_t max_blocksize = 0;  // == min for fixed-blocksize streams
  uint64_t total_samples = 0;
  size_t audio_offset = 0;  // first frame byte offset
  size_t seektable_off = 0;  // SEEKTABLE entry bytes (0 = absent)
  uint32_t seektable_len = 0;
};

bool parse_streaminfo(const uint8_t* data, size_t size, StreamInfo* out) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool seen_streaminfo = false;
  while (pos + 4 <= size) {
    uint8_t hdr = data[pos];
    bool last = hdr & 0x80;
    uint8_t type = hdr & 0x7f;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) |
                   data[pos + 3];
    pos += 4;
    if (pos + len > size) return false;
    if (type == 0 && len >= 34) {
      const uint8_t* p = data + pos;
      out->max_blocksize = ((uint32_t)p[2] << 8) | p[3];
      out->sample_rate =
          ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
      out->channels = ((p[12] >> 1) & 0x7) + 1;
      out->bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      out->total_samples = ((uint64_t)(p[13] & 0xf) << 32) |
                           ((uint64_t)p[14] << 24) | ((uint64_t)p[15] << 16) |
                           ((uint64_t)p[16] << 8) | p[17];
      seen_streaminfo = true;
    } else if (type == 3) {
      out->seektable_off = pos;
      out->seektable_len = len;
    }
    pos += len;
    if (last) break;
  }
  out->audio_offset = pos;
  return seen_streaminfo;
}

uint8_t crc8(const uint8_t* p, size_t n) {  // poly 0x07, init 0 (FLAC header CRC)
  uint8_t c = 0;
  while (n--) {
    c ^= *p++;
    for (int i = 0; i < 8; ++i)
      c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x07) : (uint8_t)(c << 1);
  }
  return c;
}

uint64_t read_u64_be(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 0; i < 8; ++i) v = (v << 8) | p[i];
  return v;
}

// Decode one subframe into x[0..blocksize). Returns false on error.
bool decode_subframe(BitReader& br, int64_t* x, uint32_t blocksize, int bps) {
  if (br.read_bit() != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) {
    wasted = 1 + (int)br.read_unary();
    bps -= wasted;
  }
  if (br.error || bps <= 0) return false;

  int order = 0;
  bool is_fixed = false, is_lpc = false;
  if (type == 0) {
    // CONSTANT
    int64_t v = br.read_signed(bps);
    for (uint32_t i = 0; i < blocksize; ++i) x[i] = v;
  } else if (type == 1) {
    // VERBATIM
    for (uint32_t i = 0; i < blocksize; ++i) x[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {
    is_fixed = true;
    order = (int)(type & 7);
  } else if (type >= 32) {
    is_lpc = true;
    order = (int)(type & 31) + 1;
  } else {
    return false;  // reserved
  }

  if (is_fixed || is_lpc) {
    for (int i = 0; i < order; ++i) x[i] = br.read_signed(bps);

    int32_t coefs[32];
    int shift = 0;
    if (is_lpc) {
      int precision = (int)br.read_bits(4) + 1;
      if (precision == 16) return false;  // invalid (1111)
      shift = (int)br.read_signed(5);
      if (shift < 0) return false;
      for (int i = 0; i < order; ++i) coefs[i] = (int32_t)br.read_signed(precision);
    }

    // residual
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t po = (uint32_t)br.read_bits(4);
    uint32_t partitions = 1u << po;
    if (blocksize % partitions != 0) return false;
    uint32_t idx = order;
    for (uint32_t p = 0; p < partitions; ++p) {
      uint32_t count = blocksize >> po;
      if (p == 0) count -= order;
      uint32_t param = (uint32_t)br.read_bits(param_bits);
      if (param == escape) {
        uint32_t raw = (uint32_t)br.read_bits(5);
        for (uint32_t i = 0; i < count; ++i)
          x[idx++] = raw ? br.read_signed((int)raw) : 0;
      } else {
        for (uint32_t i = 0; i < count; ++i) {
          uint32_t q = br.read_unary();
          uint64_t u = ((uint64_t)q << param) | br.read_bits((int)param);
          x[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
        }
      }
      if (br.error) return false;
    }

    // prediction
    if (is_fixed) {
      switch (order) {
        case 0:
          break;
        case 1:
          for (uint32_t i = 1; i < blocksize; ++i) x[i] += x[i - 1];
          break;
        case 2:
          for (uint32_t i = 2; i < blocksize; ++i)
            x[i] += 2 * x[i - 1] - x[i - 2];
          break;
        case 3:
          for (uint32_t i = 3; i < blocksize; ++i)
            x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
          break;
        case 4:
          for (uint32_t i = 4; i < blocksize; ++i)
            x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
          break;
        default:
          return false;
      }
    } else {
      for (uint32_t i = order; i < blocksize; ++i) {
        int64_t acc = 0;
        for (int j = 0; j < order; ++j) acc += (int64_t)coefs[j] * x[i - 1 - j];
        x[i] += acc >> shift;
      }
    }
  }

  if (wasted > 0)
    for (uint32_t i = 0; i < blocksize; ++i) x[i] <<= wasted;
  return !br.error;
}

uint64_t read_utf8_number(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra = 0;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    return b0;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    br.error = true;
    return 0;
  }
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

const uint32_t kBlockSizes[16] = {0,   192, 576,  1152, 2304, 4608, 0,    0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

struct FrameHeader {
  int64_t sample = -1;   // stream sample index of the frame's first sample
  uint32_t blocksize = 0;
};

// Validate + parse a byte-aligned frame header at ``pos``: sync pattern,
// reserved bits, field ranges, and the header CRC-8 — strict enough that a
// random byte position essentially never passes, which is what makes the
// binary-search seek below safe on files without a SEEKTABLE.
bool parse_frame_header(const uint8_t* data, size_t size, size_t pos,
                        const StreamInfo& si, FrameHeader* out) {
  if (pos + 6 > size) return false;
  if (data[pos] != 0xFF || (data[pos + 1] & 0xFC) != 0xF8) return false;
  BitReader br{data, size};
  br.byte_pos = pos;
  br.read_bits(14);                      // sync (verified by the byte test)
  br.read_bit();                         // reserved (0 via the 0xFC test)
  uint32_t blocking = br.read_bit();     // 0 fixed-blocksize, 1 variable
  uint32_t bs_code = (uint32_t)br.read_bits(4);
  uint32_t sr_code = (uint32_t)br.read_bits(4);
  uint32_t chan_code = (uint32_t)br.read_bits(4);
  uint32_t ss_code = (uint32_t)br.read_bits(3);
  uint32_t reserved = br.read_bit();
  if (bs_code == 0 || sr_code == 15 || chan_code > 10 || ss_code == 3 ||
      reserved != 0)
    return false;
  uint64_t number = read_utf8_number(br);
  if (br.error) return false;
  uint32_t blocksize;
  if (bs_code == 6)
    blocksize = (uint32_t)br.read_bits(8) + 1;
  else if (bs_code == 7)
    blocksize = (uint32_t)br.read_bits(16) + 1;
  else
    blocksize = kBlockSizes[bs_code];
  if (blocksize == 0) return false;
  if (sr_code == 12)
    br.read_bits(8);
  else if (sr_code == 13 || sr_code == 14)
    br.read_bits(16);
  if (br.error || br.bit_pos != 0 || br.byte_pos >= size) return false;
  if (crc8(data + pos, br.byte_pos - pos) != data[br.byte_pos]) return false;
  uint32_t nominal = si.max_blocksize ? si.max_blocksize : blocksize;
  out->sample = blocking ? (int64_t)number : (int64_t)number * (int64_t)nominal;
  out->blocksize = blocksize;
  return true;
}

bool find_frame_from(const uint8_t* data, size_t size, size_t from,
                     size_t limit, const StreamInfo& si, size_t* byte_out,
                     FrameHeader* fh) {
  if (limit > size) limit = size;
  for (size_t p = from; p + 2 < limit; ++p) {
    if (data[p] != 0xFF || (data[p + 1] & 0xFC) != 0xF8) continue;
    if (parse_frame_header(data, size, p, si, fh)) {
      *byte_out = p;
      return true;
    }
  }
  return false;
}

// Position the decode at the latest frame boundary <= ``start``:
// SEEKTABLE lookup when the block exists, else binary search over verified
// frame headers (converges to a <=64 KiB window, so the pre-roll decode is
// bounded regardless of file length).
void seek_to_start(const uint8_t* data, size_t size, const StreamInfo& si,
                   int64_t start, size_t* byte_pos, int64_t* sample_pos) {
  *byte_pos = si.audio_offset;
  *sample_pos = 0;
  if (start <= 0) return;

  if (si.seektable_len >= 18 &&
      si.seektable_off + si.seektable_len <= size) {
    const uint8_t* st = data + si.seektable_off;
    uint64_t best_sample = 0, best_off = 0;
    bool found = false;
    for (uint32_t i = 0; i + 18 <= si.seektable_len; i += 18) {
      uint64_t sample = read_u64_be(st + i);
      uint64_t off = read_u64_be(st + i + 8);
      if (sample == 0xFFFFFFFFFFFFFFFFull) continue;  // placeholder point
      if ((int64_t)sample <= start && (!found || sample >= best_sample)) {
        best_sample = sample;
        best_off = off;
        found = true;
      }
    }
    if (found) {
      size_t cand = si.audio_offset + (size_t)best_off;
      FrameHeader fh;
      if (cand < size && parse_frame_header(data, size, cand, si, &fh) &&
          fh.sample == (int64_t)best_sample) {
        *byte_pos = cand;
        *sample_pos = (int64_t)best_sample;
        return;
      }
      // corrupt/stale seek point: fall through to the binary search
    }
  }

  size_t lo = si.audio_offset;
  int64_t lo_sample = 0;
  size_t hi = size;
  while (hi > lo + 65536) {
    size_t mid = lo + (hi - lo) / 2;
    FrameHeader fh;
    size_t fb;
    if (!find_frame_from(data, size, mid, hi, si, &fb, &fh)) {
      hi = mid;  // no frame start in [mid, hi): target is earlier
      continue;
    }
    if (fh.sample <= start) {
      lo = fb;
      lo_sample = fh.sample;
    } else {
      hi = mid;
    }
  }
  *byte_pos = lo;
  *sample_pos = lo_sample;
}

}  // namespace

extern "C" {

struct FlacInfo {
  uint32_t sample_rate;
  uint32_t channels;
  uint32_t bits_per_sample;
  uint64_t total_samples;
};

// Parse STREAMINFO. Returns 0 on success.
int edmflac_info(const uint8_t* data, size_t size, FlacInfo* info) {
  StreamInfo si;
  if (!parse_streaminfo(data, size, &si)) return -1;
  info->sample_rate = si.sample_rate;
  info->channels = si.channels;
  info->bits_per_sample = si.bits_per_sample;
  info->total_samples = si.total_samples;
  return 0;
}

// Decode samples [start, start+count) into out (interleaved float32 in
// [-1, 1], length count * channels). count < 0 means "to the end".
// Returns the number of samples (per channel) written, or -1 on error.
// ``frames_out``/``samples_out`` (optional) report how many frames/samples
// were actually decoded — with seeking this is O(count), not O(file).
int64_t edmflac_decode_stats(const uint8_t* data, size_t size, int64_t start,
                             int64_t count, float* out, int64_t* frames_out,
                             int64_t* samples_out) {
  if (frames_out) *frames_out = 0;
  if (samples_out) *samples_out = 0;
  StreamInfo si;
  if (!parse_streaminfo(data, size, &si)) return -1;
  if (si.channels == 0 || si.channels > 8) return -1;
  if (count < 0) count = (int64_t)si.total_samples - start;
  if (start < 0 || count < 0) return -1;

  const int64_t end = start + count;
  const double scale = 1.0 / (double)(1ull << (si.bits_per_sample - 1));

  BitReader br{data, size};
  int64_t sample_pos = 0;  // stream position of current frame start
  seek_to_start(data, size, si, start, &br.byte_pos, &sample_pos);

  // per-channel scratch (max legal blocksize 65535)
  static thread_local int64_t* chan_buf[8] = {nullptr};
  static thread_local uint32_t chan_cap = 0;

  int64_t written = 0;

  while (sample_pos < end && br.byte_pos < size && !br.error) {
    // frame header
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) return -1;
    br.read_bit();  // reserved
    uint32_t blocking = br.read_bit();
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t chan_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();  // reserved
    uint64_t number = read_utf8_number(br);
    (void)number;
    (void)blocking;

    uint32_t blocksize;
    if (bs_code == 6)
      blocksize = (uint32_t)br.read_bits(8) + 1;
    else if (bs_code == 7)
      blocksize = (uint32_t)br.read_bits(16) + 1;
    else
      blocksize = kBlockSizes[bs_code];
    if (blocksize == 0) return -1;

    if (sr_code == 12)
      br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14)
      br.read_bits(16);

    br.read_bits(8);  // CRC-8 (not verified)

    int bps;
    switch (ss_code) {
      case 0: bps = (int)si.bits_per_sample; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -1;
    }

    uint32_t nch = si.channels;
    int mode = 0;  // 0 independent, 1 left/side, 2 right/side, 3 mid/side
    if (chan_code <= 7) {
      nch = chan_code + 1;
    } else if (chan_code == 8) {
      nch = 2; mode = 1;
    } else if (chan_code == 9) {
      nch = 2; mode = 2;
    } else if (chan_code == 10) {
      nch = 2; mode = 3;
    } else {
      return -1;
    }
    if (nch != si.channels) return -1;

    if (blocksize > chan_cap) {
      for (uint32_t c = 0; c < 8; ++c) {
        delete[] chan_buf[c];
        chan_buf[c] = new int64_t[blocksize];
      }
      chan_cap = blocksize;
    }

    for (uint32_t c = 0; c < nch; ++c) {
      int ch_bps = bps;
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
          (mode == 3 && c == 1))
        ch_bps += 1;  // side channel
      if (!decode_subframe(br, chan_buf[c], blocksize, ch_bps)) return -1;
    }
    br.align();
    br.read_bits(16);  // CRC-16 (not verified)

    // stereo decorrelation
    if (mode == 1) {  // left/side
      for (uint32_t i = 0; i < blocksize; ++i)
        chan_buf[1][i] = chan_buf[0][i] - chan_buf[1][i];
    } else if (mode == 2) {  // right/side: ch0=side, ch1=right
      for (uint32_t i = 0; i < blocksize; ++i)
        chan_buf[0][i] = chan_buf[1][i] + chan_buf[0][i];
    } else if (mode == 3) {  // mid/side
      for (uint32_t i = 0; i < blocksize; ++i) {
        int64_t side = chan_buf[1][i];
        int64_t mid = (chan_buf[0][i] << 1) | (side & 1);
        chan_buf[0][i] = (mid + side) >> 1;
        chan_buf[1][i] = (mid - side) >> 1;
      }
    }

    // copy the window overlap
    int64_t frame_start = sample_pos;
    int64_t frame_end = sample_pos + blocksize;
    int64_t lo = frame_start > start ? frame_start : start;
    int64_t hi = frame_end < end ? frame_end : end;
    for (int64_t i = lo; i < hi; ++i) {
      for (uint32_t c = 0; c < nch; ++c)
        out[(i - start) * nch + c] =
            (float)((double)chan_buf[c][i - frame_start] * scale);
    }
    if (hi > lo) written = hi - start;

    sample_pos = frame_end;
    if (frames_out) ++*frames_out;
    if (samples_out) *samples_out += blocksize;
  }
  return written;
}

int64_t edmflac_decode(const uint8_t* data, size_t size, int64_t start,
                       int64_t count, float* out) {
  return edmflac_decode_stats(data, size, start, count, out, nullptr, nullptr);
}

}  // extern "C"
