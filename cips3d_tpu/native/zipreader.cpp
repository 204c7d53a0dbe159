// Native zip + PNG data loader for the training pipeline.
//
// TPU-native counterpart of the reference's data path: the reference trains
// from a StyleGAN-format zip of PNGs through a torch DataLoader with C++
// worker ops (tl2's dataset_stylegan3 + torch native decode); here a small
// C++ library does the hot IO work (central-directory parsing, deflate,
// PNG reconstruction) and Python drives it via ctypes
// (cips3d_tpu/native/__init__.py).  Falls back to PIL when unavailable.
//
// Supports: zip entries stored (method 0) or deflated (method 8); PNG
// bit-depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
// 6 (RGBA), all five scanline filters.  Output is always RGB8 (HWC).
//
// Build: g++ -O3 -shared -fPIC -o libzipreader.so zipreader.cpp -lz

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Entry {
  std::string name;
  uint64_t offset;        // local header offset
  uint32_t comp_size;
  uint32_t uncomp_size;
  uint16_t method;        // 0 = stored, 8 = deflate
};

struct Archive {
  FILE* f = nullptr;
  std::vector<Entry> entries;
};

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

bool parse_central_directory(Archive* ar) {
  // Find EOCD: scan the last 64KB + 22 bytes for the signature.
  if (fseek(ar->f, 0, SEEK_END) != 0) return false;
  long fsize = ftell(ar->f);
  long scan = fsize < 65557 ? fsize : 65557;
  std::vector<uint8_t> tail(scan);
  if (fseek(ar->f, fsize - scan, SEEK_SET) != 0) return false;
  if ((long)fread(tail.data(), 1, scan, ar->f) != scan) return false;

  long eocd = -1;
  for (long i = scan - 22; i >= 0; --i) {
    if (tail[i] == 0x50 && tail[i + 1] == 0x4b && tail[i + 2] == 0x05 &&
        tail[i + 3] == 0x06) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) return false;
  uint16_t n_entries = rd16(&tail[eocd + 10]);
  uint32_t cd_size = rd32(&tail[eocd + 12]);
  uint32_t cd_offset = rd32(&tail[eocd + 16]);

  std::vector<uint8_t> cd(cd_size);
  if (fseek(ar->f, cd_offset, SEEK_SET) != 0) return false;
  if (fread(cd.data(), 1, cd_size, ar->f) != cd_size) return false;

  size_t pos = 0;
  for (int i = 0; i < n_entries; ++i) {
    if (pos + 46 > cd_size) return false;
    const uint8_t* h = &cd[pos];
    if (rd32(h) != 0x02014b50) return false;
    Entry e;
    e.method = rd16(h + 10);
    e.comp_size = rd32(h + 20);
    e.uncomp_size = rd32(h + 24);
    uint16_t name_len = rd16(h + 28);
    uint16_t extra_len = rd16(h + 30);
    uint16_t comment_len = rd16(h + 32);
    e.offset = rd32(h + 42);
    e.name.assign((const char*)(h + 46), name_len);
    ar->entries.push_back(std::move(e));
    pos += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

// Read + decompress one entry into out (resized).
bool read_entry(Archive* ar, const Entry& e, std::vector<uint8_t>* out) {
  // local header: 30 bytes + name + extra (lengths may differ from CD)
  uint8_t lh[30];
  if (fseek(ar->f, (long)e.offset, SEEK_SET) != 0) return false;
  if (fread(lh, 1, 30, ar->f) != 30) return false;
  if (rd32(lh) != 0x04034b50) return false;
  uint16_t name_len = rd16(lh + 26);
  uint16_t extra_len = rd16(lh + 28);
  if (fseek(ar->f, name_len + extra_len, SEEK_CUR) != 0) return false;

  std::vector<uint8_t> comp(e.comp_size);
  if (fread(comp.data(), 1, e.comp_size, ar->f) != e.comp_size) return false;

  out->resize(e.uncomp_size);
  if (e.method == 0) {
    if (e.comp_size != e.uncomp_size) return false;
    memcpy(out->data(), comp.data(), e.comp_size);
    return true;
  }
  if (e.method != 8) return false;
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;  // raw deflate
  zs.next_in = comp.data();
  zs.avail_in = e.comp_size;
  zs.next_out = out->data();
  zs.avail_out = e.uncomp_size;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0);
}

// ---------------- PNG ----------------

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8-bit PNG into RGB8; returns 0 on success.
int decode_png(const uint8_t* data, size_t size, std::vector<uint8_t>* rgb,
               uint32_t* out_w, uint32_t* out_h) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || memcmp(data, magic, 8) != 0) return 1;

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples

  size_t pos = 8;
  while (pos + 8 <= size) {
    uint32_t len = ((uint32_t)data[pos] << 24) | ((uint32_t)data[pos + 1] << 16) |
                   ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    const char* type = (const char*)&data[pos + 4];
    const uint8_t* body = &data[pos + 8];
    if (pos + 12 + len > size) return 2;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = ((uint32_t)body[0] << 24) | (body[1] << 16) | (body[2] << 8) | body[3];
      h = ((uint32_t)body[4] << 24) | (body[5] << 16) | (body[6] << 8) | body[7];
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (memcmp(type, "PLTE", 4) == 0) {
      palette.assign(body, body + len);
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0 || bit_depth != 8 || interlace != 0) return 3;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;   // gray
    case 2: channels = 3; break;   // rgb
    case 3: channels = 1; break;   // palette index
    case 4: channels = 2; break;   // gray + alpha
    case 6: channels = 4; break;   // rgba
    default: return 4;
  }

  size_t stride = (size_t)w * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return 5;  // zlib-wrapped
  zs.next_in = const_cast<uint8_t*>(idat.data());
  zs.avail_in = (uInt)idat.size();
  zs.next_out = raw.data();
  zs.avail_out = (uInt)raw.size();
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (!(rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0))) return 6;

  // un-filter scanlines in place into `img`
  std::vector<uint8_t> img(stride * h);
  const int bpp = channels;
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &img[y * stride];
    const uint8_t* up = y > 0 ? &img[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= (size_t)bpp ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)bpp) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return 7;
      }
      dst[x] = (uint8_t)v;
    }
  }

  // convert to RGB8
  rgb->resize((size_t)w * h * 3);
  uint8_t* o = rgb->data();
  const uint8_t* p = img.data();
  size_t n = (size_t)w * h;
  switch (color_type) {
    case 0:
      for (size_t i = 0; i < n; ++i) { o[3 * i] = o[3 * i + 1] = o[3 * i + 2] = p[i]; }
      break;
    case 2:
      memcpy(o, p, n * 3);
      break;
    case 3:
      if (palette.empty()) return 8;
      for (size_t i = 0; i < n; ++i) {
        size_t idx = (size_t)p[i] * 3;
        if (idx + 2 >= palette.size()) return 9;
        o[3 * i] = palette[idx];
        o[3 * i + 1] = palette[idx + 1];
        o[3 * i + 2] = palette[idx + 2];
      }
      break;
    case 4:
      for (size_t i = 0; i < n; ++i) { o[3 * i] = o[3 * i + 1] = o[3 * i + 2] = p[2 * i]; }
      break;
    case 6:
      for (size_t i = 0; i < n; ++i) {
        o[3 * i] = p[4 * i];
        o[3 * i + 1] = p[4 * i + 1];
        o[3 * i + 2] = p[4 * i + 2];
      }
      break;
  }
  *out_w = w;
  *out_h = h;
  return 0;
}

}  // namespace

extern "C" {

void* zr_open(const char* path) {
  Archive* ar = new Archive();
  ar->f = fopen(path, "rb");
  if (!ar->f || !parse_central_directory(ar)) {
    if (ar->f) fclose(ar->f);
    delete ar;
    return nullptr;
  }
  return ar;
}

void zr_close(void* h) {
  Archive* ar = (Archive*)h;
  if (ar) {
    if (ar->f) fclose(ar->f);
    delete ar;
  }
}

int64_t zr_count(void* h) { return (int64_t)((Archive*)h)->entries.size(); }

const char* zr_name(void* h, int64_t i) {
  Archive* ar = (Archive*)h;
  if (i < 0 || (size_t)i >= ar->entries.size()) return nullptr;
  return ar->entries[i].name.c_str();
}

// Returns uncompressed size of entry i, or -1.
int64_t zr_entry_size(void* h, int64_t i) {
  Archive* ar = (Archive*)h;
  if (i < 0 || (size_t)i >= ar->entries.size()) return -1;
  return ar->entries[i].uncomp_size;
}

// Read raw entry bytes into buf (must hold zr_entry_size bytes); 0 = ok.
int zr_read_raw(void* h, int64_t i, uint8_t* buf) {
  Archive* ar = (Archive*)h;
  if (i < 0 || (size_t)i >= ar->entries.size()) return 1;
  std::vector<uint8_t> out;
  if (!read_entry(ar, ar->entries[i], &out)) return 2;
  memcpy(buf, out.data(), out.size());
  return 0;
}

// Decode PNG entry i. Pass query=1 to only fill w/h. Otherwise buf must hold
// w*h*3 bytes. Returns 0 on success, >0 error code.
int zr_read_image(void* h, int64_t i, uint8_t* buf, uint32_t* w, uint32_t* out_h,
                  int query) {
  Archive* ar = (Archive*)h;
  if (i < 0 || (size_t)i >= ar->entries.size()) return 1;
  std::vector<uint8_t> raw;
  if (!read_entry(ar, ar->entries[i], &raw)) return 2;
  std::vector<uint8_t> rgb;
  int rc = decode_png(raw.data(), raw.size(), &rgb, w, out_h);
  if (rc != 0) return 10 + rc;
  if (!query) memcpy(buf, rgb.data(), rgb.size());
  return 0;
}

}  // extern "C"
