// cv::linemod ORACLE for parity testing.
//
// The BASELINE acceptance bar is "detections within 1 px / 1 score unit of
// OpenCV linemod".  The Python cv2 wheel in this environment ships without
// the linemod module, but the system has libopencv_rgbd 4.6 with the full
// C++ cv::linemod implementation — this shim exposes exactly the surface
// the reference uses (rgbdDetector.cpp:31-34, 1668-1692: Detector ctor
// with ColorGradient[/DepthNormal] and T={5,8}, addTemplate, match,
// FileStorage read/write in the writeLinemod/readLinemod layout) through a
// C ABI for ctypes, so tests can cross-check our engine against the real
// thing on identical inputs.
//
// Build: make oracle (links -lopencv_rgbd -lopencv_core -lopencv_imgproc).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/rgbd/linemod.hpp>

namespace {

cv::Ptr<cv::linemod::Detector> make_detector(int use_depth, int num_features) {
  std::vector<cv::Ptr<cv::linemod::Modality>> modalities;
  modalities.push_back(cv::makePtr<cv::linemod::ColorGradient>(
      10.0f, num_features, 55.0f));
  if (use_depth)
    modalities.push_back(cv::makePtr<cv::linemod::DepthNormal>(
        2000, 50, num_features, 2));
  std::vector<int> T_pyramid = {5, 8};  // renderer.cpp:182-185
  return cv::makePtr<cv::linemod::Detector>(modalities, T_pyramid);
}

struct Oracle {
  cv::Ptr<cv::linemod::Detector> det;
};

}  // namespace

extern "C" {

void* lpe_oracle_create(int use_depth, int num_features) {
  Oracle* o = new Oracle();
  o->det = make_detector(use_depth, num_features);
  return o;
}

void lpe_oracle_destroy(void* h) { delete static_cast<Oracle*>(h); }

// rgb: (h, w, 3) u8; depth: (h, w) u16 mm or null; mask: (h, w) u8.
// Returns the new template id or -1 (addTemplate failure — the reference
// skips such views, renderer.cpp:309-315).  bbox receives (x, y, w, h).
int lpe_oracle_add_template(void* h, const uint8_t* rgb, int height, int width,
                            const uint16_t* depth, const uint8_t* mask,
                            int32_t* bbox) {
  Oracle* o = static_cast<Oracle*>(h);
  cv::Mat m_rgb(height, width, CV_8UC3, const_cast<uint8_t*>(rgb));
  cv::Mat m_mask(height, width, CV_8UC1, const_cast<uint8_t*>(mask));
  std::vector<cv::Mat> sources = {m_rgb};
  if (depth)
    sources.push_back(
        cv::Mat(height, width, CV_16UC1, const_cast<uint16_t*>(depth)));
  cv::Rect rect;
  int tid = o->det->addTemplate(sources, "obj", m_mask, &rect);
  if (tid >= 0 && bbox) {
    bbox[0] = rect.x;
    bbox[1] = rect.y;
    bbox[2] = rect.width;
    bbox[3] = rect.height;
  }
  return tid;
}

// Match; fills up to cap rows of (x, y, template_id) and similarities.
// Returns the match count (clamped to cap).
int lpe_oracle_match(void* h, const uint8_t* rgb, int height, int width,
                     const uint16_t* depth, float threshold,
                     int32_t* out_xyt, float* out_sim, int cap) {
  Oracle* o = static_cast<Oracle*>(h);
  cv::Mat m_rgb(height, width, CV_8UC3, const_cast<uint8_t*>(rgb));
  std::vector<cv::Mat> sources = {m_rgb};
  if (depth)
    sources.push_back(
        cv::Mat(height, width, CV_16UC1, const_cast<uint16_t*>(depth)));
  std::vector<cv::linemod::Match> matches;
  o->det->match(sources, threshold, matches);
  int n = 0;
  for (const auto& m : matches) {
    if (n >= cap) break;
    out_xyt[n * 3 + 0] = m.x;
    out_xyt[n * 3 + 1] = m.y;
    out_xyt[n * 3 + 2] = m.template_id;
    out_sim[n] = m.similarity;
    ++n;
  }
  return n;
}

// Serialize in the reference's writeLinemod layout (rgbdDetector.cpp:
// 1682-1692): Detector::write then a "classes" list of writeClass nodes.
int lpe_oracle_write(void* h, const char* path) {
  Oracle* o = static_cast<Oracle*>(h);
  cv::FileStorage fs(path, cv::FileStorage::WRITE);
  if (!fs.isOpened()) return -1;
  o->det->write(fs);
  std::vector<cv::String> ids = o->det->classIds();
  fs << "classes" << "[";
  for (const auto& id : ids) {
    fs << "{";
    o->det->writeClass(id, fs);
    fs << "}";
  }
  fs << "]";
  return 0;
}

// Deserialize in the reference's readLinemod layout (rgbdDetector.cpp:
// 1668-1680).
void* lpe_oracle_read(const char* path) {
  cv::FileStorage fs(path, cv::FileStorage::READ);
  if (!fs.isOpened()) return nullptr;
  Oracle* o = new Oracle();
  o->det = cv::makePtr<cv::linemod::Detector>();
  try {
    o->det->read(fs.root());
    cv::FileNode fn = fs["classes"];
    for (cv::FileNodeIterator i = fn.begin(), iend = fn.end(); i != iend; ++i)
      o->det->readClass(*i);
  } catch (...) {
    delete o;
    return nullptr;
  }
  return o;
}

int lpe_oracle_num_templates(void* h) {
  return static_cast<Oracle*>(h)->det->numTemplates();
}

int lpe_oracle_pyramid_levels(void* h) {
  return static_cast<Oracle*>(h)->det->pyramidLevels();
}

// Template features: entry `idx` of the pyramid (idx = level*num_mod + mod).
// Fills (x, y, label) triples; returns the feature count (clamped), and
// size[0..1] = (width, height).
int lpe_oracle_template(void* h, int tid, int idx, int32_t* out, int cap,
                        int32_t* size) {
  Oracle* o = static_cast<Oracle*>(h);
  const std::vector<cv::linemod::Template>& tp =
      o->det->getTemplates("obj", tid);
  if (idx < 0 || idx >= static_cast<int>(tp.size())) return -1;
  const cv::linemod::Template& t = tp[idx];
  if (size) {
    size[0] = t.width;
    size[1] = t.height;
  }
  int n = 0;
  for (const auto& f : t.features) {
    if (n >= cap) break;
    out[n * 3 + 0] = f.x;
    out[n * 3 + 1] = f.y;
    out[n * 3 + 2] = f.label;
    ++n;
  }
  return n;
}

// Quantized image of modality `mod` (0 = ColorGradient, 1 = DepthNormal)
// at pyramid level 0: the one-hot orientation bitmask cv::linemod builds
// before spreading.  Returns 0 on success.
int lpe_oracle_quantize(void* h, int mod, const uint8_t* rgb, int height,
                        int width, const uint16_t* depth, uint8_t* out) {
  Oracle* o = static_cast<Oracle*>(h);
  const std::vector<cv::Ptr<cv::linemod::Modality>>& mods =
      o->det->getModalities();
  if (mod < 0 || mod >= static_cast<int>(mods.size())) return -1;
  cv::Mat src;
  if (mod == 0)
    src = cv::Mat(height, width, CV_8UC3, const_cast<uint8_t*>(rgb));
  else if (depth)
    src = cv::Mat(height, width, CV_16UC1, const_cast<uint16_t*>(depth));
  else
    return -2;
  cv::Ptr<cv::linemod::QuantizedPyramid> qp =
      mods[mod]->process(src, cv::Mat());
  cv::Mat q;
  qp->quantize(q);
  if (q.rows != height || q.cols != width || q.type() != CV_8UC1) return -3;
  std::memcpy(out, q.data, static_cast<size_t>(height) * width);
  return 0;
}

// Same, after `level` QuantizedPyramid::pyrDown calls — exposes the real
// engine's per-level quantization semantics (e.g. whether DepthNormal
// re-quantizes downsampled depth or subsamples the level-0 normals).
// `out` must hold (height >> level) * (width >> level) bytes.
int lpe_oracle_quantize_level(void* h, int mod, const uint8_t* rgb,
                              int height, int width, const uint16_t* depth,
                              int level, uint8_t* out) {
  Oracle* o = static_cast<Oracle*>(h);
  const std::vector<cv::Ptr<cv::linemod::Modality>>& mods =
      o->det->getModalities();
  if (mod < 0 || mod >= static_cast<int>(mods.size())) return -1;
  cv::Mat src;
  if (mod == 0)
    src = cv::Mat(height, width, CV_8UC3, const_cast<uint8_t*>(rgb));
  else if (depth)
    src = cv::Mat(height, width, CV_16UC1, const_cast<uint16_t*>(depth));
  else
    return -2;
  cv::Ptr<cv::linemod::QuantizedPyramid> qp =
      mods[mod]->process(src, cv::Mat());
  for (int l = 0; l < level; ++l) qp->pyrDown();
  cv::Mat q;
  qp->quantize(q);
  const int eh = height >> level, ew = width >> level;
  if (q.rows != eh || q.cols != ew || q.type() != CV_8UC1) return -3;
  std::memcpy(out, q.data, static_cast<size_t>(eh) * ew);
  return 0;
}

}  // extern "C"
