// cvms_runtime: native (C++) host-runtime for the TPU SLAM engine.
//
// TPU-native analogue of the reference's C++ ingestion/recording layers:
//   * odometry text parsing + min-step/redirect preprocessing
//     (reference: loadOdometryData/getOneMomentData, SLAM.cpp:363-519)
//   * JPEG -> grayscale float32 decode (reference: loadPictures +
//     cvCvtColor RGB->gray per frame, SLAM.cpp:529-543)
//   * a threaded double-buffered image prefetcher so disk decode overlaps
//     the device step (new capability; the reference is single-threaded)
//   * buffered text recording of RobotPath.txt / FeaturesInfo.txt
//     (reference: recordRobotInformation/recordFeaturesInformation,
//      SLAM.cpp:3499-3603)
//
// Pure C ABI for ctypes binding (no pybind11 in this image). Everything is
// host-side I/O; device compute stays in JAX/XLA/Pallas.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <string>
#include <vector>
#include <thread>
#include <mutex>
#include <condition_variable>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// Odometry: parse "<id> : <t> <x> <y> <theta>" lines, rebase to the start
// pose, drop rows until |dx| or |dy| >= min_step_xy, flag |wrap(dtheta)| >
// min_step_theta rows as redirections.  Matches
// cv_monoslam_tpu/io/dataset.py::preprocess_odometry bit-for-bit on f64.
// ---------------------------------------------------------------------------

static double wrap_angle(double a) { return atan2(sin(a), cos(a)); }

// Parses the file at `path`. Writes up to `capacity` kept rows into
// ids/xy/theta/redirect (caller-allocated: ids int64[cap], xy f64[cap*2],
// theta f64[cap], redirect uint8[cap]). Returns kept-row count, or -1 on
// open failure, -2 if no rows parsed.
int cvms_load_odometry(const char* path, double min_step_xy,
                       double min_step_theta, long long capacity,
                       double init_x, double init_y,
                       long long* ids, double* xy, double* theta,
                       uint8_t* redirect) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::string text;
  char buf[1 << 16];
  size_t r;
  while ((r = fread(buf, 1, sizeof buf, f)) > 0) text.append(buf, r);
  fclose(f);

  long long n = 0;
  double x0 = 0, y0 = 0, last_x = init_x, last_y = init_y;
  bool have_first = false;
  double prev_theta = 0;

  const char* p = text.c_str();
  while (*p) {
    const char* eol = strchr(p, '\n');
    size_t len = eol ? (size_t)(eol - p) : strlen(p);
    long long id;
    double t, x, y, th;
    // reference scan format: "%d : %*lf %lf %lf %lf" (SLAM.cpp:474-475)
    if (sscanf(p, " %lld : %lf %lf %lf %lf", &id, &t, &x, &y, &th) == 5) {
      if (!have_first) {
        x0 = x; y0 = y;
        ids[0] = id;
        xy[0] = init_x; xy[1] = init_y;
        theta[0] = th; redirect[0] = 0;
        prev_theta = th;
        have_first = true;
        n = 1;
      } else if (n <= capacity) {
        double rx = init_x + (x - x0), ry = init_y + (y - y0);
        if (fabs(rx - last_x) >= min_step_xy ||
            fabs(ry - last_y) >= min_step_xy) {
          ids[n] = id;
          xy[2 * n] = rx; xy[2 * n + 1] = ry;
          theta[n] = th;
          redirect[n] = fabs(wrap_angle(th - prev_theta)) > min_step_theta;
          prev_theta = th;
          last_x = rx; last_y = ry;
          n++;
          if (n > capacity) break;
        }
      }
    }
    p += len + (eol ? 1 : 0);
  }
  if (n == 0) return -2;
  return (int)(n > capacity ? capacity : n);
}

// ---------------------------------------------------------------------------
// JPEG -> grayscale float32 decode (libjpeg). Gray = BT.601 luma, matching
// OpenCV's CV_RGB2GRAY used by the reference each frame (SLAM.cpp:542).
// ---------------------------------------------------------------------------

struct CvmsJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void cvms_jpeg_error_exit(j_common_ptr cinfo) {
  CvmsJpegErr* e = (CvmsJpegErr*)cinfo->err;
  longjmp(e->jb, 1);
}

// Decode `n` bytes of JPEG into out (float32, row-major, gray in [0,255]).
// out must hold max_w*max_h floats. Writes decoded dims into *w/*h.
// Returns 0 on success, -1 decode error, -2 too large.
int cvms_decode_jpeg_gray(const uint8_t* buf, long long n, float* out,
                          int max_w, int max_h, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  CvmsJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = cvms_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;  // libjpeg uses BT.601 luma
  jpeg_start_decompress(&cinfo);
  int W = cinfo.output_width, H = cinfo.output_height;
  if (W > max_w || H > max_h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  std::vector<uint8_t> row(W);
  uint8_t* rp = row.data();
  while ((int)cinfo.output_scanline < H) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* o = out + (long long)y * W;
    for (int x = 0; x < W; x++) o[x] = (float)row[x];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *w = W;
  *h = H;
  return 0;
}

// Decode a JPEG file from disk (convenience wrapper).
int cvms_decode_jpeg_file_gray(const char* path, float* out, int max_w,
                               int max_h, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -3;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)n);
  if (fread(buf.data(), 1, (size_t)n, f) != (size_t)n) {
    fclose(f);
    return -4;
  }
  fclose(f);
  return cvms_decode_jpeg_gray(buf.data(), n, out, max_w, max_h, w, h);
}

// ---------------------------------------------------------------------------
// Threaded prefetcher: a background thread decodes frames ahead of the
// consumer into a small ring of buffers, so JPEG decode overlaps the TPU
// step. Frame list = printf-pattern (e.g. "%04d.jpg") + id array, the
// reference's image-sequence mode (SLAM.cpp:306-308).
// ---------------------------------------------------------------------------

struct CvmsPrefetcher {
  std::string pattern;
  std::vector<long long> ids;
  int w = 0, h = 0, depth = 0;
  std::vector<std::vector<float>> ring;
  std::vector<int> status;   // 0 empty, 1 full, <0 error code
  size_t head = 0;           // next frame index the consumer takes
  size_t filled = 0;         // frames produced so far
  std::mutex mu;
  std::condition_variable cv_full, cv_free;
  std::thread worker;
  bool stop = false;

  void run() {
    char pathbuf[4096];
    for (size_t i = 0; i < ids.size(); i++) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          return stop || (long long)(filled - head) < depth;
        });
        if (stop) return;
      }
      snprintf(pathbuf, sizeof pathbuf, pattern.c_str(), (int)ids[i]);
      int dw, dh;
      int rc = cvms_decode_jpeg_file_gray(pathbuf, ring[i % depth].data(),
                                          w, h, &dw, &dh);
      {
        std::lock_guard<std::mutex> lk(mu);
        status[i % depth] = rc == 0 ? 1 : rc;
        filled = i + 1;
      }
      cv_full.notify_one();
    }
  }
};

void* cvms_prefetch_open(const char* pattern, const long long* ids,
                         long long n, int w, int h, int depth) {
  CvmsPrefetcher* p = new CvmsPrefetcher();
  p->pattern = pattern;
  p->ids.assign(ids, ids + n);
  p->w = w;
  p->h = h;
  p->depth = depth < 2 ? 2 : depth;
  p->ring.resize(p->depth);
  for (auto& b : p->ring) b.resize((size_t)w * h);
  p->status.assign(p->depth, 0);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until the next frame is decoded; copies it into out (w*h floats).
// Returns 0 ok, 1 end-of-sequence, <0 decode error for that frame.
int cvms_prefetch_next(void* handle, float* out) {
  CvmsPrefetcher* p = (CvmsPrefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->head >= p->ids.size()) return 1;
  p->cv_full.wait(lk, [&] { return p->filled > p->head; });
  size_t slot = p->head % p->depth;
  int st = p->status[slot];
  if (st == 1)
    memcpy(out, p->ring[slot].data(), (size_t)p->w * p->h * sizeof(float));
  p->head++;
  lk.unlock();
  p->cv_free.notify_one();
  return st == 1 ? 0 : st;
}

void cvms_prefetch_close(void* handle) {
  CvmsPrefetcher* p = (CvmsPrefetcher*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_free.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

// ---------------------------------------------------------------------------
// Recorder: buffered append of the reference's two output files.
// RobotPath.txt row: index odo_x odo_y est_x est_y p00 p01 p10 p11
// (SLAM.cpp:3546-3556); FeaturesInfo.txt row: id x y z (SLAM.cpp:3596-3602).
// ---------------------------------------------------------------------------

struct CvmsRecorder {
  FILE* robot = nullptr;
  FILE* feats = nullptr;
};

void* cvms_recorder_open(const char* robot_path, const char* feats_path) {
  CvmsRecorder* r = new CvmsRecorder();
  if (robot_path && robot_path[0]) r->robot = fopen(robot_path, "a");
  if (feats_path && feats_path[0]) r->feats = fopen(feats_path, "a");
  return r;
}

void cvms_record_robot(void* handle, long long frame, double odo_x,
                       double odo_y, double est_x, double est_y,
                       const double* cov2x2) {
  CvmsRecorder* r = (CvmsRecorder*)handle;
  if (!r->robot) return;
  fprintf(r->robot, "%lld %.10f %.10f %.10f %.10f %.10e %.10e %.10e %.10e\n",
          frame, odo_x, odo_y, est_x, est_y, cov2x2[0], cov2x2[1], cov2x2[2],
          cov2x2[3]);
}

void cvms_record_features(void* handle, const long long* ids,
                          const double* xyz, const uint8_t* valid,
                          long long n) {
  CvmsRecorder* r = (CvmsRecorder*)handle;
  if (!r->feats) return;
  for (long long i = 0; i < n; i++)
    if (valid[i])
      fprintf(r->feats, "%lld %.10f %.10f %.10f\n", ids[i], xyz[3 * i],
              xyz[3 * i + 1], xyz[3 * i + 2]);
}

void cvms_recorder_close(void* handle) {
  CvmsRecorder* r = (CvmsRecorder*)handle;
  if (r->robot) fclose(r->robot);
  if (r->feats) fclose(r->feats);
  delete r;
}

}  // extern "C"
