// tario: native multi-view tar-shard loader for handmvnet-tpu.
//
// The reference feeds its trainer with webdataset + multiprocessing workers
// (reference: src/datasets/ho3d.py:285-311). Here the CPU-side hot path —
// tar parsing, sample grouping, and JPEG decode (libjpeg) — runs in a C++
// thread pool that fills a bounded ring of ready samples; Python drains it
// via ctypes (handmvnet_tpu/data/native_loader.py) and only unpickles the
// tiny label payloads. Images land directly in C-owned RGB buffers that
// numpy wraps zero-copy before the device upload.
//
// Build: see native/Makefile (emits libtario.so).
//
// Exposed C ABI:
//   tario_create(paths, n_paths, num_views, height, width, n_threads, cap)
//   tario_create_scaled(..., scale_denom)  — DCT-domain downscaled decode
//   tario_next(loader, img_out, label_out, label_cap, key_out, key_cap)
//     -> >=0: label size; TARIO_END when all shards are exhausted; <0 error
//   tario_destroy(loader)

#include <cstddef>
#include <cstdio>
#include <csetjmp>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kTarioEnd = -1;
constexpr int kTarioError = -2;

struct Sample {
  std::string key;
  std::vector<std::vector<uint8_t>> images;  // decoded RGB, per view
  std::vector<uint8_t> label;                // raw pickle bytes
};

// ---------------------------------------------------------------- tar ----

struct TarEntry {
  std::string name;
  std::vector<uint8_t> payload;
};

size_t octal_field(const char* p, size_t n) {
  size_t value = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] < '0' || p[i] > '7') continue;
    value = value * 8 + static_cast<size_t>(p[i] - '0');
  }
  return value;
}

// Streams regular-file members of one (uncompressed) tar shard.
class TarReader {
 public:
  explicit TarReader(const std::string& path) : file_(fopen(path.c_str(), "rb")) {}
  ~TarReader() {
    if (file_) fclose(file_);
  }
  bool ok() const { return file_ != nullptr; }

  bool next(TarEntry* out) {
    if (!file_) return false;
    char header[512];
    while (true) {
      if (fread(header, 1, 512, file_) != 512) return false;
      if (header[0] == '\0') return false;  // end-of-archive zero block
      size_t size = octal_field(header + 124, 12);
      char type = header[156];
      std::string name(header, strnlen(header, 100));
      // honor GNU/POSIX long-name extensions ('L') transparently
      if (type == 'L') {
        std::vector<char> long_name(size);
        if (fread(long_name.data(), 1, size, file_) != size) return false;
        skip_padding(size);
        if (fread(header, 1, 512, file_) != 512) return false;
        size = octal_field(header + 124, 12);
        type = header[156];
        name.assign(long_name.data(), strnlen(long_name.data(), long_name.size()));
      }
      if (type != '0' && type != '\0') {  // not a regular file: skip payload
        skip_payload(size);
        continue;
      }
      out->name = std::move(name);
      out->payload.resize(size);
      if (size && fread(out->payload.data(), 1, size, file_) != size) return false;
      skip_padding(size);
      return true;
    }
  }

 private:
  void skip_padding(size_t size) {
    size_t pad = (512 - size % 512) % 512;
    if (pad) fseek(file_, static_cast<long>(pad), SEEK_CUR);
  }
  void skip_payload(size_t size) {
    fseek(file_, static_cast<long>(size + (512 - size % 512) % 512), SEEK_CUR);
  }
  FILE* file_;
};

// --------------------------------------------------------------- jpeg ----

struct JpegErrorMgr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG into an RGB buffer of exactly height x width x 3; returns
// false on malformed data or size mismatch.
// scale_denom in {1,2,4,8}: libjpeg DCT-domain downscaling — decoding at
// 1/2 resolution costs ~1/3 of a full decode (fewer IDCTs + fewer pixels),
// the cheap lever when the host is decode-bound (LOADER_BENCH.json).
// `height`/`width` are the EXPECTED OUTPUT dims (already divided).
bool decode_jpeg_rgb(const uint8_t* data, size_t size, int height, int width,
                     uint8_t* out, int scale_denom) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom > 0 ? scale_denom : 1;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != height ||
      static_cast<int>(cinfo.output_width) != width ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// -------------------------------------------------------------- loader ----

class Loader {
 public:
  Loader(std::vector<std::string> paths, int num_views, int height, int width,
         int n_threads, int capacity, int scale_denom)
      : paths_(std::move(paths)),
        num_views_(num_views),
        height_(height),
        width_(width),
        capacity_(capacity),
        scale_denom_(scale_denom > 0 ? scale_denom : 1) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { work(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_ready_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Samples dropped so far (incomplete groups / failed decodes).
  long dropped() const { return dropped_.load(std::memory_order_relaxed); }

  // Blocks until a sample is ready (or the stream ends).
  std::unique_ptr<Sample> next() {
    std::unique_lock<std::mutex> lock(mu_);
    cv_ready_.wait(lock, [this] {
      return !queue_.empty() || (active_workers_ == 0 && next_shard_ >= paths_.size());
    });
    if (queue_.empty()) return nullptr;
    auto sample = std::move(queue_.front());
    queue_.pop_front();
    cv_space_.notify_one();
    return sample;
  }

 private:
  void work() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      ++active_workers_;
    }
    while (true) {
      size_t shard_idx;
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (stop_ || next_shard_ >= paths_.size()) break;
        shard_idx = next_shard_++;
      }
      process_shard(paths_[shard_idx]);
    }
    {
      std::lock_guard<std::mutex> lock(mu_);
      --active_workers_;
    }
    cv_ready_.notify_all();
  }

  void process_shard(const std::string& path) {
    TarReader reader(path);
    if (!reader.ok()) return;
    TarEntry entry;
    auto sample = std::make_unique<Sample>();
    sample->images.resize(num_views_);
    std::string current_key;
    int decoded = 0;
    bool have_label = false;

    auto flush = [&]() {
      if (!current_key.empty() && decoded == num_views_ && have_label) {
        sample->key = current_key;
        push(std::move(sample));
        sample = std::make_unique<Sample>();
        sample->images.resize(num_views_);
      } else if (!current_key.empty()) {
        // drop incomplete sample groups (missing views/label, malformed
        // JPEG, or frame dims != the expected height_ x width_ — note that
        // with scale_denom the expectation is ceil(SOURCE_hw/denom), so any
        // shard frame whose real size differs from the configured source
        // resolution lands here too). Counted so silent drops are
        // observable from Python (tario_dropped).
        dropped_.fetch_add(1, std::memory_order_relaxed);
        sample = std::make_unique<Sample>();
        sample->images.resize(num_views_);
      }
      decoded = 0;
      have_label = false;
    };

    while (reader.next(&entry)) {
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (stop_) return;
      }
      // entry name: "<key>.<field>", possibly with a directory prefix
      std::string base = entry.name;
      size_t slash = base.find_last_of('/');
      if (slash != std::string::npos) base = base.substr(slash + 1);
      size_t dot = base.find('.');
      if (dot == std::string::npos) continue;
      std::string key = base.substr(0, dot);
      std::string field = base.substr(dot + 1);

      if (key != current_key) {
        flush();
        current_key = key;
      }
      if (field.rfind("image_", 0) == 0 && field.size() > 6 &&
          field[6] >= '0' && field[6] <= '9') {
        int view = atoi(field.c_str() + 6);
        if (view >= 0 && view < num_views_) {
          auto& buf = sample->images[view];
          // only the FIRST entry for a view is decoded: a duplicate entry
          // must neither bump `decoded` (stale bytes from the previous
          // sample could then be emitted for a still-unfilled view) nor be
          // decoded over the already-good buffer (a corrupt duplicate would
          // partially overwrite it while the view stays counted)
          if (buf.empty()) {
            buf.resize(static_cast<size_t>(height_) * width_ * 3);
            if (decode_jpeg_rgb(entry.payload.data(), entry.payload.size(),
                                height_, width_, buf.data(), scale_denom_)) {
              ++decoded;
            } else {
              buf.clear();  // failed decode leaves the view unfilled -> drop
            }
          }
        }
      } else if (field == "label.pyd") {
        sample->label = std::move(entry.payload);
        have_label = true;
      }
    }
    flush();
  }

  void push(std::unique_ptr<Sample> sample) {
    std::unique_lock<std::mutex> lock(mu_);
    cv_space_.wait(lock, [this] {
      return static_cast<int>(queue_.size()) < capacity_ || stop_;
    });
    if (stop_) return;
    queue_.push_back(std::move(sample));
    cv_ready_.notify_one();
  }

  std::vector<std::string> paths_;
  int num_views_, height_, width_, capacity_;
  int scale_denom_ = 1;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_ready_, cv_space_;
  std::deque<std::unique_ptr<Sample>> queue_;
  size_t next_shard_ = 0;
  int active_workers_ = 0;
  bool stop_ = false;
  std::atomic<long> dropped_{0};
};

}  // namespace

extern "C" {

void* tario_create(const char** paths, int n_paths, int num_views, int height,
                   int width, int n_threads, int capacity) {
  std::vector<std::string> vec(paths, paths + n_paths);
  return new Loader(std::move(vec), num_views, height, width, n_threads,
                    capacity > 0 ? capacity : 64, /*scale_denom=*/1);
}

// height/width are the EXPECTED OUTPUT dims: ceil(orig / scale_denom).
void* tario_create_scaled(const char** paths, int n_paths, int num_views,
                          int height, int width, int n_threads, int capacity,
                          int scale_denom) {
  std::vector<std::string> vec(paths, paths + n_paths);
  return new Loader(std::move(vec), num_views, height, width, n_threads,
                    capacity > 0 ? capacity : 64, scale_denom);
}

// img_out must hold num_views*height*width*3 bytes. Returns the label byte
// count (>=0), kTarioEnd at stream end, kTarioError on overflow.
int tario_next(void* handle, uint8_t* img_out, uint8_t* label_out,
               int label_cap, char* key_out, int key_cap) {
  auto* loader = static_cast<Loader*>(handle);
  auto sample = loader->next();
  if (!sample) return kTarioEnd;
  size_t off = 0;
  for (size_t v = 0; v < sample->images.size(); ++v) {
    memcpy(img_out + off, sample->images[v].data(), sample->images[v].size());
    off += sample->images[v].size();
  }
  if (static_cast<int>(sample->label.size()) > label_cap) return kTarioError;
  memcpy(label_out, sample->label.data(), sample->label.size());
  snprintf(key_out, key_cap, "%s", sample->key.c_str());
  return static_cast<int>(sample->label.size());
}

// Samples silently dropped so far (incomplete view/label groups, malformed
// JPEGs, or frames whose decoded dims differ from the expected height/width).
long tario_dropped(void* handle) {
  return static_cast<Loader*>(handle)->dropped();
}

void tario_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
