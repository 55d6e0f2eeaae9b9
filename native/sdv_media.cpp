// sdv_media — native media runtime for stable_diffusion_videos_tpu.
//
// TPU-native equivalent of the reference's native media stack (ffmpeg/libx264
// + PyAV, SURVEY.md §2.3): a threaded MJPEG encoder + self-contained RIFF/AVI
// muxer with interleaved PCM audio.  Purpose: the video-assembly stage must
// never stall the TPU dispatch queue — frames are handed off zero-copy-in,
// JPEG-encoded on a worker pool, and muxed in order by a dedicated writer
// thread, so host-side encode runs fully overlapped with device compute.
//
// Exposed as a C API (extern "C") consumed from Python via ctypes
// (media/native_sink.py).  No dependencies beyond libjpeg + pthreads.
//
// Build: g++ -O2 -fPIC -shared -o libsdv_media.so sdv_media.cpp -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG encoding (libjpeg, in-memory destination)
// ---------------------------------------------------------------------------

std::vector<uint8_t> encode_jpeg(const uint8_t* rgb, int w, int h,
                                 int quality) {
  jpeg_compress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);

  unsigned char* buf = nullptr;
  unsigned long buf_size = 0;
  jpeg_mem_dest(&cinfo, &buf, &buf_size);

  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);

  std::vector<const uint8_t*> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = rgb + static_cast<size_t>(y) * w * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<JSAMPROW>(rows[cinfo.next_scanline]);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  std::vector<uint8_t> out(buf, buf + buf_size);
  free(buf);
  jpeg_destroy_compress(&cinfo);
  return out;
}

// ---------------------------------------------------------------------------
// RIFF/AVI muxer: MJPG video stream + optional PCM16 audio stream
// ---------------------------------------------------------------------------

void put_u32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 24) & 0xff);
}
void put_u16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back(x & 0xff);
  v.push_back((x >> 8) & 0xff);
}
void put_4cc(std::vector<uint8_t>& v, const char* s) {
  v.insert(v.end(), s, s + 4);
}

struct IdxEntry {
  char fourcc[4];
  uint32_t offset;  // relative to 'movi' + 4
  uint32_t size;
};

class AviWriter {
 public:
  // fps is a rational (fps_num/fps_den) so fractional source rates
  // (29.97 = 30000/1001) survive the AVI scale/rate header exactly.
  AviWriter(const std::string& path, int w, int h, int fps_num, int fps_den,
            int sr, int channels)
      : w_(w), h_(h), fps_num_(fps_num), fps_den_(fps_den > 0 ? fps_den : 1),
        sr_(sr), channels_(channels) {
    f_ = fopen(path.c_str(), "wb");
    if (!f_) return;
    write_headers_placeholder();
  }

  bool ok() const { return f_ != nullptr; }

  void add_video_chunk(const std::vector<uint8_t>& jpeg) {
    write_chunk("00dc", jpeg.data(), jpeg.size());
    ++n_frames_;
  }

  void add_audio_chunk(const int16_t* samples, size_t n_samples) {
    write_chunk("01wb", reinterpret_cast<const uint8_t*>(samples),
                n_samples * sizeof(int16_t));
    n_audio_samples_ += n_samples / channels_;
  }

  void finish() {
    if (!f_) return;
    // idx1
    long idx_pos = ftell(f_);
    std::vector<uint8_t> idx;
    put_4cc(idx, "idx1");
    put_u32(idx, static_cast<uint32_t>(entries_.size() * 16));
    for (const auto& e : entries_) {
      idx.insert(idx.end(), e.fourcc, e.fourcc + 4);
      put_u32(idx, 0x10);  // AVIIF_KEYFRAME
      put_u32(idx, e.offset);
      put_u32(idx, e.size);
    }
    fwrite(idx.data(), 1, idx.size(), f_);
    long file_end = ftell(f_);

    // patch RIFF size, movi list size, frame counts
    patch_u32(4, static_cast<uint32_t>(file_end - 8));
    patch_u32(movi_size_pos_,
              static_cast<uint32_t>(idx_pos - movi_size_pos_ - 4));
    patch_u32(avih_frames_pos_, n_frames_);
    patch_u32(strh_video_len_pos_, n_frames_);
    if (sr_ > 0) patch_u32(strh_audio_len_pos_, n_audio_samples_);
    fclose(f_);
    f_ = nullptr;
  }

  ~AviWriter() {
    if (f_) finish();
  }

 private:
  void patch_u32(long pos, uint32_t val) {
    fseek(f_, pos, SEEK_SET);
    uint8_t b[4] = {static_cast<uint8_t>(val & 0xff),
                    static_cast<uint8_t>((val >> 8) & 0xff),
                    static_cast<uint8_t>((val >> 16) & 0xff),
                    static_cast<uint8_t>((val >> 24) & 0xff)};
    fwrite(b, 1, 4, f_);
    fseek(f_, 0, SEEK_END);
  }

  void write_chunk(const char* fourcc, const uint8_t* data, size_t size) {
    IdxEntry e;
    memcpy(e.fourcc, fourcc, 4);
    e.offset = static_cast<uint32_t>(ftell(f_) - movi_start_ - 4);
    e.size = static_cast<uint32_t>(size);
    entries_.push_back(e);
    std::vector<uint8_t> hdr;
    put_4cc(hdr, fourcc);
    put_u32(hdr, static_cast<uint32_t>(size));
    fwrite(hdr.data(), 1, hdr.size(), f_);
    fwrite(data, 1, size, f_);
    if (size & 1) fputc(0, f_);  // even padding
  }

  void write_headers_placeholder() {
    std::vector<uint8_t> v;
    int n_streams = sr_ > 0 ? 2 : 1;
    put_4cc(v, "RIFF");
    put_u32(v, 0);  // patched
    put_4cc(v, "AVI ");

    // hdrl list
    std::vector<uint8_t> hdrl;
    put_4cc(hdrl, "hdrl");
    {
      std::vector<uint8_t> avih;
      put_u32(avih, fps_num_ > 0
                        ? static_cast<uint32_t>(1000000ull * fps_den_ /
                                                fps_num_)
                        : 0);  // usec/frame
      put_u32(avih, static_cast<uint32_t>(
                  static_cast<uint64_t>(w_) * h_ * 3 * fps_num_ /
                  fps_den_));  // maxBytes/s
      put_u32(avih, 0);                                // padding
      put_u32(avih, 0x10 | 0x100);                     // HASINDEX|ISINTERLEAVED
      avih_frames_rel_ = avih.size();
      put_u32(avih, 0);  // totalFrames (patched)
      put_u32(avih, 0);  // initialFrames
      put_u32(avih, n_streams);
      put_u32(avih, static_cast<uint32_t>(w_) * h_ * 3);
      put_u32(avih, w_);
      put_u32(avih, h_);
      for (int i = 0; i < 4; ++i) put_u32(avih, 0);
      put_4cc(hdrl, "avih");
      put_u32(hdrl, static_cast<uint32_t>(avih.size()));
      avih_frames_rel_ += hdrl.size();
      hdrl.insert(hdrl.end(), avih.begin(), avih.end());
    }
    {
      // video stream list
      std::vector<uint8_t> strl;
      put_4cc(strl, "strl");
      std::vector<uint8_t> strh;
      put_4cc(strh, "vids");
      put_4cc(strh, "MJPG");
      put_u32(strh, 0);  // flags
      put_u16(strh, 0);  // priority
      put_u16(strh, 0);  // language
      put_u32(strh, 0);  // initialFrames
      put_u32(strh, static_cast<uint32_t>(fps_den_));  // scale
      put_u32(strh, static_cast<uint32_t>(fps_num_));    // rate
      put_u32(strh, 0);  // start
      strh_video_len_rel_ = strh.size();
      put_u32(strh, 0);  // length (patched)
      put_u32(strh, static_cast<uint32_t>(w_) * h_ * 3);
      put_u32(strh, 0xFFFFFFFF);  // quality
      put_u32(strh, 0);           // sampleSize
      put_u16(strh, 0); put_u16(strh, 0);
      put_u16(strh, static_cast<uint16_t>(w_));
      put_u16(strh, static_cast<uint16_t>(h_));

      std::vector<uint8_t> strf;  // BITMAPINFOHEADER
      put_u32(strf, 40);
      put_u32(strf, w_);
      put_u32(strf, h_);
      put_u16(strf, 1);
      put_u16(strf, 24);
      put_4cc(strf, "MJPG");
      put_u32(strf, static_cast<uint32_t>(w_) * h_ * 3);
      put_u32(strf, 0); put_u32(strf, 0); put_u32(strf, 0); put_u32(strf, 0);

      put_4cc(strl, "strh");
      put_u32(strl, static_cast<uint32_t>(strh.size()));
      strh_video_len_rel_ += strl.size();
      strl.insert(strl.end(), strh.begin(), strh.end());
      put_4cc(strl, "strf");
      put_u32(strl, static_cast<uint32_t>(strf.size()));
      strl.insert(strl.end(), strf.begin(), strf.end());

      put_4cc(hdrl, "LIST");
      put_u32(hdrl, static_cast<uint32_t>(strl.size()));
      strh_video_len_rel_ += hdrl.size();
      hdrl.insert(hdrl.end(), strl.begin(), strl.end());
    }
    if (sr_ > 0) {
      std::vector<uint8_t> strl;
      put_4cc(strl, "strl");
      std::vector<uint8_t> strh;
      put_4cc(strh, "auds");
      put_u32(strh, 0);
      put_u32(strh, 0);
      put_u16(strh, 0); put_u16(strh, 0);
      put_u32(strh, 0);
      put_u32(strh, 1);            // scale
      put_u32(strh, sr_);          // rate
      put_u32(strh, 0);            // start
      strh_audio_len_rel_ = strh.size();
      put_u32(strh, 0);            // length in samples (patched)
      put_u32(strh, sr_ * channels_ * 2);
      put_u32(strh, 0xFFFFFFFF);
      put_u32(strh, channels_ * 2);  // sampleSize = blockAlign
      put_u16(strh, 0); put_u16(strh, 0); put_u16(strh, 0); put_u16(strh, 0);

      std::vector<uint8_t> strf;  // WAVEFORMATEX (PCM)
      put_u16(strf, 1);
      put_u16(strf, static_cast<uint16_t>(channels_));
      put_u32(strf, sr_);
      put_u32(strf, sr_ * channels_ * 2);
      put_u16(strf, static_cast<uint16_t>(channels_ * 2));
      put_u16(strf, 16);
      put_u16(strf, 0);

      put_4cc(strl, "strh");
      put_u32(strl, static_cast<uint32_t>(strh.size()));
      strh_audio_len_rel_ += strl.size();
      strl.insert(strl.end(), strh.begin(), strh.end());
      put_4cc(strl, "strf");
      put_u32(strl, static_cast<uint32_t>(strf.size()));
      strl.insert(strl.end(), strf.begin(), strf.end());

      audio_strl_rel_ = hdrl.size();
      put_4cc(hdrl, "LIST");
      put_u32(hdrl, static_cast<uint32_t>(strl.size()));
      strh_audio_len_rel_ += hdrl.size();
      hdrl.insert(hdrl.end(), strl.begin(), strl.end());
    }

    size_t hdrl_pos = v.size();
    put_4cc(v, "LIST");
    put_u32(v, static_cast<uint32_t>(hdrl.size()));
    v.insert(v.end(), hdrl.begin(), hdrl.end());

    // absolute positions of patch points
    avih_frames_pos_ = static_cast<long>(hdrl_pos + 8 + avih_frames_rel_);
    strh_video_len_pos_ =
        static_cast<long>(hdrl_pos + 8 + strh_video_len_rel_);
    if (sr_ > 0)
      strh_audio_len_pos_ =
          static_cast<long>(hdrl_pos + 8 + strh_audio_len_rel_);

    // movi list
    put_4cc(v, "LIST");
    movi_size_pos_ = static_cast<long>(v.size());
    put_u32(v, 0);  // patched
    movi_start_ = static_cast<long>(v.size());
    put_4cc(v, "movi");

    fwrite(v.data(), 1, v.size(), f_);
  }

  FILE* f_ = nullptr;
  int w_, h_, fps_num_, fps_den_, sr_, channels_;
  uint32_t n_frames_ = 0;
  uint32_t n_audio_samples_ = 0;
  long movi_size_pos_ = 0, movi_start_ = 0;
  long avih_frames_pos_ = 0, strh_video_len_pos_ = 0,
       strh_audio_len_pos_ = 0;
  size_t avih_frames_rel_ = 0, strh_video_len_rel_ = 0,
         strh_audio_len_rel_ = 0, audio_strl_rel_ = 0;
  std::vector<IdxEntry> entries_;
};

// ---------------------------------------------------------------------------
// Threaded sink: worker pool encodes, writer muxes in submission order
// ---------------------------------------------------------------------------

struct Job {
  uint64_t seq;
  std::vector<uint8_t> rgb;  // w*h*3
};

class Sink {
 public:
  Sink(const std::string& path, int w, int h, int fps_num, int fps_den,
       int quality, int n_threads, int sr, int channels)
      : avi_(path, w, h, fps_num, fps_den, sr, channels),
        w_(w), h_(h), quality_(quality), sr_(sr), fps_num_(fps_num),
        fps_den_(fps_den > 0 ? fps_den : 1), channels_(channels) {
    if (!avi_.ok()) return;
    ok_ = true;
    int n = n_threads > 0 ? n_threads : 2;
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { worker_loop(); });
    writer_ = std::thread([this] { writer_loop(); });
  }

  bool ok() const { return ok_; }

  void add_frame(const uint8_t* rgb) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] { return queue_.size() < kMaxQueue; });
      Job j;
      j.seq = next_seq_++;
      j.rgb.assign(rgb, rgb + static_cast<size_t>(w_) * h_ * 3);
      queue_.push_back(std::move(j));
    }
    cv_work_.notify_one();
  }

  void add_audio(const int16_t* samples, size_t n) {
    std::lock_guard<std::mutex> lk(audio_mu_);
    audio_.insert(audio_.end(), samples, samples + n);
  }

  uint64_t frames_submitted() const { return next_seq_; }

  void finish() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_work_.notify_all();
    for (auto& t : workers_) t.join();
    {
      std::lock_guard<std::mutex> lk(out_mu_);
      encode_done_ = true;
    }
    cv_out_.notify_all();
    writer_.join();
    // trailing audio after the last interleave point
    flush_audio_all();
    avi_.finish();
  }

 private:
  static constexpr size_t kMaxQueue = 16;  // backpressure bound

  void worker_loop() {
    for (;;) {
      Job j;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [this] { return done_ || !queue_.empty(); });
        if (queue_.empty()) return;  // done_ && empty
        j = std::move(queue_.front());
        queue_.pop_front();
      }
      cv_space_.notify_one();
      auto jpeg = encode_jpeg(j.rgb.data(), w_, h_, quality_);
      {
        std::lock_guard<std::mutex> lk(out_mu_);
        ready_[j.seq] = std::move(jpeg);
      }
      cv_out_.notify_one();
    }
  }

  void writer_loop() {
    uint64_t next_write = 0;
    for (;;) {
      std::vector<uint8_t> jpeg;
      {
        std::unique_lock<std::mutex> lk(out_mu_);
        cv_out_.wait(lk, [&] {
          return ready_.count(next_write) ||
                 (encode_done_ && ready_.empty() &&
                  next_write >= next_seq_);
        });
        auto it = ready_.find(next_write);
        if (it == ready_.end()) return;  // all flushed
        jpeg = std::move(it->second);
        ready_.erase(it);
      }
      avi_.add_video_chunk(jpeg);
      interleave_audio_upto(next_write + 1);
      ++next_write;
    }
  }

  // write audio samples covering [0, frames/fps) as we go
  void interleave_audio_upto(uint64_t frames) {
    if (sr_ <= 0) return;
    std::lock_guard<std::mutex> lk(audio_mu_);
    size_t want = static_cast<size_t>(
        frames * static_cast<uint64_t>(sr_) * fps_den_ /
        (fps_num_ > 0 ? static_cast<uint64_t>(fps_num_) : 30));
    want *= channels_;
    if (want > audio_written_ && audio_.size() > audio_written_) {
      size_t upto = std::min(want, audio_.size());
      avi_.add_audio_chunk(audio_.data() + audio_written_,
                           upto - audio_written_);
      audio_written_ = upto;
    }
  }

  void flush_audio_all() {
    if (sr_ <= 0) return;
    std::lock_guard<std::mutex> lk(audio_mu_);
    if (audio_.size() > audio_written_)
      avi_.add_audio_chunk(audio_.data() + audio_written_,
                           audio_.size() - audio_written_);
  }

  AviWriter avi_;
  int w_, h_, quality_, sr_, fps_num_, fps_den_, channels_;
  bool ok_ = false;

  std::mutex mu_;
  std::condition_variable cv_work_, cv_space_;
  std::deque<Job> queue_;
  bool done_ = false;
  uint64_t next_seq_ = 0;
  std::vector<std::thread> workers_;

  std::mutex out_mu_;
  std::condition_variable cv_out_;
  std::map<uint64_t, std::vector<uint8_t>> ready_;
  bool encode_done_ = false;
  std::thread writer_;

  std::mutex audio_mu_;
  std::vector<int16_t> audio_;
  size_t audio_written_ = 0;
};

}  // namespace

// ---------------------------------------------------------------------------
// C API (ctypes)
// ---------------------------------------------------------------------------

extern "C" {

void* sdv_sink_open(const char* path, int w, int h, int fps_num,
                    int fps_den, int quality, int n_threads, int audio_sr,
                    int audio_channels) {
  Sink* s = new Sink(path, w, h, fps_num, fps_den, quality, n_threads,
                     audio_sr, audio_channels);
  if (!s->ok()) {
    delete s;
    return nullptr;
  }
  return s;
}

void sdv_sink_add_frame(void* handle, const uint8_t* rgb) {
  static_cast<Sink*>(handle)->add_frame(rgb);
}

void sdv_sink_add_audio(void* handle, const int16_t* samples, long n) {
  static_cast<Sink*>(handle)->add_audio(samples, static_cast<size_t>(n));
}

long sdv_sink_frames(void* handle) {
  return static_cast<long>(static_cast<Sink*>(handle)->frames_submitted());
}

void sdv_sink_close(void* handle) {
  Sink* s = static_cast<Sink*>(handle);
  s->finish();
  delete s;
}

int sdv_encode_jpeg(const uint8_t* rgb, int w, int h, int quality,
                    uint8_t* out, long out_cap) {
  auto jpeg = encode_jpeg(rgb, w, h, quality);
  if (static_cast<long>(jpeg.size()) > out_cap) return -1;
  memcpy(out, jpeg.data(), jpeg.size());
  return static_cast<int>(jpeg.size());
}

}  // extern "C"
