// ct_loader — native volume-loading runtime for the ctpa framework.
//
// The hot host-side path in training is decoding scan files (NIfTI-1, .npy,
// .npz) fast enough to keep the TPU fed.  The reference pays this cost in
// Python on torch DataLoader workers (ct_clip/data.py:114-133); here it is a
// small C++ library: zlib-backed decompression, format parsing, and a
// thread-pool batch API, exposed through a C ABI consumed via ctypes
// (ctpa/data/native_loader.py).
//
// Formats:
//   * NIfTI-1 (.nii, .nii.gz): 348-byte header, both endiannesses, common
//     datatypes, scl_slope/inter + pixdim surfaced to the caller.
//   * NumPy .npy (v1/v2): C-order little-endian numeric arrays.
//   * NumPy .npz: ZIP container (stored or deflate) of .npy members.
//
// All decode results are float32 (the model-input dtype), converted in C++.

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- utilities

struct Buffer {
  std::vector<uint8_t> data;
};

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  std::streamsize n = f.tellg();
  f.seekg(0);
  out->resize(static_cast<size_t>(n));
  return static_cast<bool>(f.read(reinterpret_cast<char*>(out->data()), n));
}

bool gzip_inflate(const uint8_t* src, size_t n, std::vector<uint8_t>* out) {
  z_stream zs{};
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // zlib or gzip
  out->clear();
  out->reserve(n * 4);
  std::vector<uint8_t> chunk(1 << 20);
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(n);
  int rc = Z_OK;
  while (rc != Z_STREAM_END) {
    zs.next_out = chunk.data();
    zs.avail_out = static_cast<uInt>(chunk.size());
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc != Z_OK && rc != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->insert(out->end(), chunk.data(),
                chunk.data() + (chunk.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

bool raw_inflate(const uint8_t* src, size_t n, size_t expect,
                 std::vector<uint8_t>* out) {
  z_stream zs{};
  if (inflateInit2(&zs, -15) != Z_OK) return false;  // raw deflate (zip)
  out->resize(expect);
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(n);
  zs.next_out = out->data();
  zs.avail_out = static_cast<uInt>(expect);
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END || (rc == Z_OK && zs.avail_out == 0);
}

// ---------------------------------------------------------------- volume

struct Volume {
  std::vector<float> data;     // converted to float32
  int64_t shape[8] = {0};
  int ndim = 0;
  float spacing[8] = {1, 1, 1, 1, 1, 1, 1, 1};
  float scl_slope = 1.0f;
  float scl_inter = 0.0f;
  bool fortran_order = false;  // true: first axis fastest (NIfTI)
  std::string error;
};

template <typename T>
void convert_to_f32(const uint8_t* src, size_t count, bool swap,
                    std::vector<float>* out) {
  out->resize(count);
  const T* p = reinterpret_cast<const T*>(src);
  for (size_t i = 0; i < count; ++i) {
    T v = p[i];
    if (swap && sizeof(T) > 1) {
      uint8_t tmp[sizeof(T)];
      std::memcpy(tmp, &p[i], sizeof(T));
      for (size_t a = 0; a < sizeof(T) / 2; ++a)
        std::swap(tmp[a], tmp[sizeof(T) - 1 - a]);
      std::memcpy(&v, tmp, sizeof(T));
    }
    (*out)[i] = static_cast<float>(v);
  }
}

bool convert_dtype(int code, const uint8_t* src, size_t bytes, size_t count,
                   bool swap, std::vector<float>* out, std::string* err) {
  switch (code) {  // NIfTI datatype codes
    case 2:    convert_to_f32<uint8_t>(src, count, swap, out); return true;
    case 4:    convert_to_f32<int16_t>(src, count, swap, out); return true;
    case 8:    convert_to_f32<int32_t>(src, count, swap, out); return true;
    case 16:   convert_to_f32<float>(src, count, swap, out); return true;
    case 64:   convert_to_f32<double>(src, count, swap, out); return true;
    case 256:  convert_to_f32<int8_t>(src, count, swap, out); return true;
    case 512:  convert_to_f32<uint16_t>(src, count, swap, out); return true;
    case 768:  convert_to_f32<uint32_t>(src, count, swap, out); return true;
    default:
      *err = "unsupported NIfTI datatype " + std::to_string(code);
      return false;
  }
}

// ---------------------------------------------------------------- NIfTI-1

bool parse_nifti(const std::vector<uint8_t>& bytes, Volume* vol) {
  if (bytes.size() < 352) {
    vol->error = "truncated NIfTI header";
    return false;
  }
  const uint8_t* h = bytes.data();
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, h, 4);
  bool swap = false;
  if (sizeof_hdr != 348) {
    uint8_t t[4] = {h[3], h[2], h[1], h[0]};
    std::memcpy(&sizeof_hdr, t, 4);
    if (sizeof_hdr != 348) {
      vol->error = "not a NIfTI-1 file";
      return false;
    }
    swap = true;
  }
  auto rd16 = [&](size_t off) {
    int16_t v;
    std::memcpy(&v, h + off, 2);
    if (swap) v = static_cast<int16_t>(((v & 0xff) << 8) | ((v >> 8) & 0xff));
    return v;
  };
  auto rd32f = [&](size_t off) {
    float v;
    if (swap) {
      uint8_t t[4] = {h[off + 3], h[off + 2], h[off + 1], h[off]};
      std::memcpy(&v, t, 4);
    } else {
      std::memcpy(&v, h + off, 4);
    }
    return v;
  };
  int ndim = rd16(40);
  if (ndim < 1 || ndim > 7) {
    vol->error = "bad ndim";
    return false;
  }
  vol->ndim = ndim;
  size_t count = 1;
  for (int i = 0; i < ndim; ++i) {
    vol->shape[i] = rd16(40 + 2 * (i + 1));
    count *= static_cast<size_t>(vol->shape[i]);
  }
  for (int i = 0; i < ndim; ++i) vol->spacing[i] = rd32f(76 + 4 * (i + 1));
  int datatype = rd16(70);
  float vox_offset = rd32f(108);
  vol->scl_slope = rd32f(112);
  vol->scl_inter = rd32f(116);
  vol->fortran_order = true;
  size_t off = static_cast<size_t>(vox_offset);
  size_t need = 0;
  switch (datatype) {
    case 2: case 256: need = count; break;
    case 4: case 512: need = count * 2; break;
    case 8: case 768: case 16: need = count * 4; break;
    case 64: need = count * 8; break;
    default: need = count * 4; break;
  }
  if (bytes.size() < off + need) {
    vol->error = "truncated NIfTI voxel data";
    return false;
  }
  return convert_dtype(datatype, bytes.data() + off, need, count, swap,
                       &vol->data, &vol->error);
}

// ---------------------------------------------------------------- .npy

bool parse_npy(const uint8_t* p, size_t n, Volume* vol) {
  if (n < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) {
    vol->error = "bad npy magic";
    return false;
  }
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    uint16_t l;
    std::memcpy(&l, p + 8, 2);
    hlen = l;
    hoff = 10;
  } else {
    uint32_t l;
    std::memcpy(&l, p + 8, 4);
    hlen = l;
    hoff = 12;
  }
  std::string header(reinterpret_cast<const char*>(p + hoff), hlen);
  auto find_val = [&](const std::string& key) -> std::string {
    auto k = header.find("'" + key + "'");
    if (k == std::string::npos) return "";
    auto c = header.find(':', k);
    return header.substr(c + 1, header.find(',', c + 1) - c - 1);
  };
  std::string descr = find_val("descr");
  bool fortran = find_val("fortran_order").find("True") != std::string::npos;
  auto sh_start = header.find("'shape'");
  auto po = header.find('(', sh_start);
  auto pc = header.find(')', po);
  std::string shape_s = header.substr(po + 1, pc - po - 1);
  vol->ndim = 0;
  size_t count = 1;
  size_t pos = 0;
  while (pos < shape_s.size() && vol->ndim < 8) {
    size_t next;
    long d = std::stol(shape_s.substr(pos), &next);
    vol->shape[vol->ndim++] = d;
    count *= static_cast<size_t>(d);
    pos += next;
    while (pos < shape_s.size() && (shape_s[pos] == ',' || shape_s[pos] == ' '))
      ++pos;
  }
  vol->fortran_order = fortran;
  const uint8_t* data = p + hoff + hlen;
  size_t avail = n - hoff - hlen;
  bool swap = descr.find('>') != std::string::npos;
  char kind = 0;
  int width = 0;
  for (char c : descr) {
    if (std::isalpha(c)) kind = c;
    if (std::isdigit(c)) width = width * 10 + (c - '0');
  }
  int code = 0;
  if (kind == 'f' && width == 4) code = 16;
  else if (kind == 'f' && width == 8) code = 64;
  else if (kind == 'i' && width == 2) code = 4;
  else if (kind == 'i' && width == 4) code = 8;
  else if (kind == 'i' && width == 1) code = 256;
  else if (kind == 'u' && width == 1) code = 2;
  else if (kind == 'u' && width == 2) code = 512;
  else if (kind == 'u' && width == 4) code = 768;
  else {
    vol->error = "unsupported npy dtype " + descr;
    return false;
  }
  if (avail < count * static_cast<size_t>(width)) {
    vol->error = "truncated npy data";
    return false;
  }
  return convert_dtype(code, data, count * width, count, swap, &vol->data,
                       &vol->error);
}

// ---------------------------------------------------------------- .npz (zip)

bool parse_npz_first(const std::vector<uint8_t>& bytes, Volume* vol) {
  // find end-of-central-directory
  if (bytes.size() < 22) {
    vol->error = "truncated zip";
    return false;
  }
  size_t eocd = std::string::npos;
  for (size_t i = bytes.size() - 22; i + 4 >= 4; --i) {
    if (bytes[i] == 0x50 && bytes[i + 1] == 0x4b && bytes[i + 2] == 0x05 &&
        bytes[i + 3] == 0x06) {
      eocd = i;
      break;
    }
    if (i == 0) break;
  }
  if (eocd == std::string::npos) {
    vol->error = "zip EOCD not found";
    return false;
  }
  uint32_t cd_off;
  std::memcpy(&cd_off, bytes.data() + eocd + 16, 4);
  uint16_t n_entries;
  std::memcpy(&n_entries, bytes.data() + eocd + 10, 2);
  size_t p = cd_off;
  for (int e = 0; e < n_entries; ++e) {
    if (p + 46 > bytes.size() || std::memcmp(bytes.data() + p, "PK\x01\x02", 4)) {
      vol->error = "bad zip central directory";
      return false;
    }
    uint16_t method, name_len, extra_len, comment_len;
    uint32_t comp_size, uncomp_size, local_off;
    std::memcpy(&method, bytes.data() + p + 10, 2);
    std::memcpy(&comp_size, bytes.data() + p + 20, 4);
    std::memcpy(&uncomp_size, bytes.data() + p + 24, 4);
    std::memcpy(&name_len, bytes.data() + p + 28, 2);
    std::memcpy(&extra_len, bytes.data() + p + 30, 2);
    std::memcpy(&comment_len, bytes.data() + p + 32, 2);
    std::memcpy(&local_off, bytes.data() + p + 42, 4);
    std::string name(reinterpret_cast<const char*>(bytes.data() + p + 46),
                     name_len);
    p += 46 + name_len + extra_len + comment_len;
    if (name.size() < 4 || name.substr(name.size() - 4) != ".npy") continue;
    // local header
    size_t lp = local_off;
    uint16_t lname, lextra;
    std::memcpy(&lname, bytes.data() + lp + 26, 2);
    std::memcpy(&lextra, bytes.data() + lp + 28, 2);
    const uint8_t* payload = bytes.data() + lp + 30 + lname + lextra;
    if (method == 0) {
      return parse_npy(payload, comp_size, vol);
    }
    if (method == 8) {
      std::vector<uint8_t> raw;
      if (!raw_inflate(payload, comp_size, uncomp_size, &raw)) {
        vol->error = "npz member inflate failed";
        return false;
      }
      return parse_npy(raw.data(), raw.size(), vol);
    }
    vol->error = "unsupported zip method";
    return false;
  }
  vol->error = "no .npy member in npz";
  return false;
}

// ---------------------------------------------------------------- dispatch

bool load_any(const std::string& path, Volume* vol) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) {
    vol->error = "cannot read " + path;
    return false;
  }
  if (bytes.size() >= 2 && bytes[0] == 0x1f && bytes[1] == 0x8b) {
    std::vector<uint8_t> inflated;
    if (!gzip_inflate(bytes.data(), bytes.size(), &inflated)) {
      vol->error = "gzip inflate failed";
      return false;
    }
    bytes.swap(inflated);
  }
  if (bytes.size() >= 6 && !std::memcmp(bytes.data(), "\x93NUMPY", 6))
    return parse_npy(bytes.data(), bytes.size(), vol);
  if (bytes.size() >= 4 && !std::memcmp(bytes.data(), "PK\x03\x04", 4))
    return parse_npz_first(bytes, vol);
  return parse_nifti(bytes, vol);
}

// ---------------------------------------------------------------- threadpool

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> g(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

struct LoadResult {
  Volume vol;
  std::atomic<bool> done{false};
};

struct Loader {
  std::unique_ptr<ThreadPool> pool;
  std::mutex mu;
  std::vector<std::shared_ptr<LoadResult>> slots;
};

}  // namespace

// ==================================================================== C ABI

extern "C" {

void* ctl_create(int num_threads) {
  auto* l = new Loader;
  l->pool = std::make_unique<ThreadPool>(num_threads > 0 ? num_threads : 4);
  return l;
}

void ctl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// async: submit a file, returns a ticket id
int64_t ctl_submit(void* handle, const char* path) {
  auto* l = static_cast<Loader*>(handle);
  auto res = std::make_shared<LoadResult>();
  int64_t id;
  {
    std::lock_guard<std::mutex> g(l->mu);
    id = static_cast<int64_t>(l->slots.size());
    l->slots.push_back(res);
  }
  std::string p(path);
  l->pool->submit([res, p] {
    load_any(p, &res->vol);
    res->done.store(true, std::memory_order_release);
  });
  return id;
}

int ctl_ready(void* handle, int64_t id) {
  auto* l = static_cast<Loader*>(handle);
  std::shared_ptr<LoadResult> res;
  {
    std::lock_guard<std::mutex> g(l->mu);
    if (id < 0 || id >= static_cast<int64_t>(l->slots.size())) return -1;
    res = l->slots[id];
  }
  return res->done.load(std::memory_order_acquire) ? 1 : 0;
}

// query metadata after ready; returns 0 ok, -1 error
int ctl_meta(void* handle, int64_t id, int64_t* shape_out, int* ndim_out,
             float* spacing_out, float* slope_out, float* inter_out,
             int* fortran_out) {
  auto* l = static_cast<Loader*>(handle);
  std::shared_ptr<LoadResult> res;
  {
    std::lock_guard<std::mutex> g(l->mu);
    if (id < 0 || id >= static_cast<int64_t>(l->slots.size())) return -1;
    res = l->slots[id];
  }
  while (!res->done.load(std::memory_order_acquire))
    std::this_thread::yield();
  if (!res->vol.error.empty()) return -1;
  *ndim_out = res->vol.ndim;
  for (int i = 0; i < res->vol.ndim; ++i) {
    shape_out[i] = res->vol.shape[i];
    spacing_out[i] = res->vol.spacing[i];
  }
  *slope_out = res->vol.scl_slope;
  *inter_out = res->vol.scl_inter;
  *fortran_out = res->vol.fortran_order ? 1 : 0;
  return 0;
}

// copy voxels (float32) into caller buffer; returns element count or -1
int64_t ctl_fetch(void* handle, int64_t id, float* out, int64_t capacity) {
  auto* l = static_cast<Loader*>(handle);
  std::shared_ptr<LoadResult> res;
  {
    std::lock_guard<std::mutex> g(l->mu);
    if (id < 0 || id >= static_cast<int64_t>(l->slots.size())) return -1;
    res = l->slots[id];
  }
  while (!res->done.load(std::memory_order_acquire))
    std::this_thread::yield();
  if (!res->vol.error.empty()) return -1;
  int64_t n = static_cast<int64_t>(res->vol.data.size());
  if (n > capacity) return -1;
  std::memcpy(out, res->vol.data.data(), n * sizeof(float));
  {
    std::lock_guard<std::mutex> g(l->mu);
    l->slots[id].reset(new LoadResult);  // release memory, keep slot
    l->slots[id]->done = true;
    l->slots[id]->vol.error = "already fetched";
  }
  return n;
}

// last error string for a ticket (empty if none); returns length copied
int ctl_error(void* handle, int64_t id, char* buf, int capacity) {
  auto* l = static_cast<Loader*>(handle);
  std::shared_ptr<LoadResult> res;
  {
    std::lock_guard<std::mutex> g(l->mu);
    if (id < 0 || id >= static_cast<int64_t>(l->slots.size())) return 0;
    res = l->slots[id];
  }
  while (!res->done.load(std::memory_order_acquire))
    std::this_thread::yield();
  int n = static_cast<int>(res->vol.error.size());
  if (n >= capacity) n = capacity - 1;
  std::memcpy(buf, res->vol.error.data(), n);
  buf[n] = 0;
  return n;
}

}  // extern "C"
