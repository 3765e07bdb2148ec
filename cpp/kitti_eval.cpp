// KITTI object-detection evaluator (2D / bird's-eye / 3D AP + AOS).
//
// Native counterpart of the reference's official evaluator
// (reference: src/tools/kitti_eval/evaluate_object_3d_offline.cpp) with the
// same protocol semantics — class tables, difficulty filters, ignored /
// dontcare handling, 41-point recall discretization, max-smoothed
// precision, and the 11-point AP summary — but self-contained C++17:
// the Boost.Geometry rotated-box overlap is replaced by an exact
// Sutherland–Hodgman convex clip (both footprints are convex quads).
//
// Usage: kitti_eval <gt_dir> <result_dir>
//   gt_dir:      KITTI label files <frame>.txt
//   result_dir:  detection files  <frame>.txt (KITTI format, 16 fields)
// Writes <result_dir>/stats_<class>_<metric>.txt (recall precision rows)
// and prints one "AP <class> <metric> <easy> <moderate> <hard>" line per
// table, plus AOS lines when orientations are provided.

#include <algorithm>
#include <array>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <numeric>
#include <string>
#include <vector>

namespace {

constexpr int NUM_CLASS = 3;
const char* CLASS_NAMES[NUM_CLASS] = {"car", "pedestrian", "cyclist"};

constexpr int32_t MIN_HEIGHT[3] = {40, 25, 25};
constexpr int32_t MAX_OCCLUSION[3] = {0, 1, 2};
constexpr double MAX_TRUNCATION[3] = {0.15, 0.3, 0.5};
// MIN_OVERLAP[metric][class]; metric: 0=image, 1=ground, 2=box3d
constexpr double MIN_OVERLAP[3][3] = {
    {0.7, 0.5, 0.5}, {0.5, 0.25, 0.25}, {0.5, 0.25, 0.25}};
constexpr double N_SAMPLE_PTS = 41;

enum Difficulty { EASY = 0, MODERATE = 1, HARD = 2 };
enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

struct Box {
  std::string type;
  double x1 = -1, y1 = -1, x2 = -1, y2 = -1;
  double alpha = -10;
};

struct Object {
  Box box;
  double truncation = -1;
  int occlusion = -1;
  double score = -1000;            // detections only
  double ry = -10;
  double t1 = -1000, t2 = -1000, t3 = -1000;
  double h = -1, w = -1, l = -1;
};

bool iequals(const std::string& a, const char* b) {
  return strcasecmp(a.c_str(), b) == 0;
}

// ---------------------------------------------------------------------
// geometry
// ---------------------------------------------------------------------

double imageBoxOverlap(const Box& a, const Box& b, int criterion) {
  const double x1 = std::max(a.x1, b.x1);
  const double y1 = std::max(a.y1, b.y1);
  const double x2 = std::min(a.x2, b.x2);
  const double y2 = std::min(a.y2, b.y2);
  const double w = x2 - x1, h = y2 - y1;
  if (w <= 0 || h <= 0) return 0;
  const double inter = w * h;
  const double a_area = (a.x2 - a.x1) * (a.y2 - a.y1);
  const double b_area = (b.x2 - b.x1) * (b.y2 - b.y1);
  if (criterion == 0) return inter / a_area;
  if (criterion == 1) return inter / b_area;
  return inter / (a_area + b_area - inter);
}

double imageBoxOverlapObj(const Object& d, const Object& g,
                          int criterion) {
  return imageBoxOverlap(d.box, g.box, criterion);
}

using Pt = std::array<double, 2>;

// footprint quad of an oriented box in the X/Z ground plane
// (matches reference toPolygon: rotation by ry, center (t1, t3))
std::vector<Pt> footprint(const Object& o) {
  const double c = std::cos(o.ry), s = std::sin(o.ry);
  const double xs[4] = {o.l / 2, o.l / 2, -o.l / 2, -o.l / 2};
  const double zs[4] = {o.w / 2, -o.w / 2, -o.w / 2, o.w / 2};
  std::vector<Pt> poly(4);
  for (int i = 0; i < 4; ++i) {
    poly[i] = {c * xs[i] + s * zs[i] + o.t1,
               -s * xs[i] + c * zs[i] + o.t3};
  }
  return poly;
}

double polyArea(const std::vector<Pt>& p) {
  double a = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % p.size()];
    a += u[0] * v[1] - v[0] * u[1];
  }
  return std::fabs(a) / 2;
}

// Sutherland–Hodgman clip of convex `subject` against convex `clip`
std::vector<Pt> convexClip(std::vector<Pt> subject,
                           const std::vector<Pt>& clip) {
  // orient the clip polygon counter-clockwise
  double a2 = 0;
  for (size_t i = 0; i < clip.size(); ++i) {
    const Pt& u = clip[i];
    const Pt& v = clip[(i + 1) % clip.size()];
    a2 += u[0] * v[1] - v[0] * u[1];
  }
  std::vector<Pt> cl = clip;
  if (a2 < 0) std::reverse(cl.begin(), cl.end());

  for (size_t e = 0; e < cl.size() && !subject.empty(); ++e) {
    const Pt& A = cl[e];
    const Pt& B = cl[(e + 1) % cl.size()];
    auto inside = [&](const Pt& p) {
      return (B[0] - A[0]) * (p[1] - A[1])
           - (B[1] - A[1]) * (p[0] - A[0]) >= -1e-12;
    };
    auto intersect = [&](const Pt& p, const Pt& q) -> Pt {
      const double a1 = B[1] - A[1], b1 = A[0] - B[0];
      const double c1 = a1 * A[0] + b1 * A[1];
      const double a2_ = q[1] - p[1], b2 = p[0] - q[0];
      const double c2 = a2_ * p[0] + b2 * p[1];
      const double det = a1 * b2 - a2_ * b1;
      if (std::fabs(det) < 1e-12) return p;
      return {(b2 * c1 - b1 * c2) / det, (a1 * c2 - a2_ * c1) / det};
    };
    std::vector<Pt> out;
    for (size_t i = 0; i < subject.size(); ++i) {
      const Pt& cur = subject[i];
      const Pt& prev = subject[(i + subject.size() - 1) % subject.size()];
      const bool cin = inside(cur), pin = inside(prev);
      if (cin) {
        if (!pin) out.push_back(intersect(prev, cur));
        out.push_back(cur);
      } else if (pin) {
        out.push_back(intersect(prev, cur));
      }
    }
    subject = std::move(out);
  }
  return subject;
}

double groundBoxOverlap(const Object& d, const Object& g, int criterion) {
  const auto dp = footprint(d), gp = footprint(g);
  const double inter = polyArea(convexClip(dp, gp));
  const double da = polyArea(dp), ga = polyArea(gp);
  if (criterion == 0) return inter / da;
  if (criterion == 1) return inter / ga;
  return inter / (da + ga - inter);
}

double box3DOverlap(const Object& d, const Object& g, int criterion) {
  const auto dp = footprint(d), gp = footprint(g);
  const double inter_area = polyArea(convexClip(dp, gp));
  const double ymax = std::min(d.t2, g.t2);
  const double ymin = std::max(d.t2 - d.h, g.t2 - g.h);
  const double inter = inter_area * std::max(0.0, ymax - ymin);
  const double dv = d.h * d.l * d.w, gv = g.h * g.l * g.w;
  if (criterion == 0) return inter / dv;
  if (criterion == 1) return inter / gv;
  return inter / (dv + gv - inter);
}

// ---------------------------------------------------------------------
// IO
// ---------------------------------------------------------------------

std::vector<Object> loadGroundtruth(const std::string& path, bool& ok) {
  std::vector<Object> out;
  FILE* fp = fopen(path.c_str(), "r");
  if (!fp) { ok = false; return out; }
  char str[255];
  while (!feof(fp)) {
    Object g;
    if (fscanf(fp, "%254s %lf %d %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                   "%lf %lf",
               str, &g.truncation, &g.occlusion, &g.box.alpha, &g.box.x1,
               &g.box.y1, &g.box.x2, &g.box.y2, &g.h, &g.w, &g.l, &g.t1,
               &g.t2, &g.t3, &g.ry) == 15) {
      g.box.type = str;
      out.push_back(g);
    } else {
      break;
    }
  }
  fclose(fp);
  ok = true;
  return out;
}

std::vector<Object> loadDetections(const std::string& path,
                                   bool& compute_aos,
                                   std::vector<bool>& eval_image,
                                   std::vector<bool>& eval_ground,
                                   std::vector<bool>& eval_3d, bool& ok) {
  std::vector<Object> out;
  FILE* fp = fopen(path.c_str(), "r");
  if (!fp) { ok = false; return out; }
  char str[255];
  double trash;
  while (!feof(fp)) {
    Object d;
    if (fscanf(fp, "%254s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                   "%lf %lf %lf",
               str, &trash, &trash, &d.box.alpha, &d.box.x1, &d.box.y1,
               &d.box.x2, &d.box.y2, &d.h, &d.w, &d.l, &d.t1, &d.t2, &d.t3,
               &d.ry, &d.score) == 16) {
      d.box.type = str;
      out.push_back(d);
      if (d.box.alpha == -10) compute_aos = false;
      for (int c = 0; c < NUM_CLASS; ++c) {
        if (iequals(d.box.type, CLASS_NAMES[c])) {
          if (!eval_image[c] && d.box.x1 >= 0) eval_image[c] = true;
          if (!eval_ground[c] && d.t1 != -1000) eval_ground[c] = true;
          if (!eval_3d[c] && d.t2 != -1000) eval_3d[c] = true;
          break;
        }
      }
    } else {
      break;
    }
  }
  fclose(fp);
  ok = true;
  return out;
}

// ---------------------------------------------------------------------
// protocol
// ---------------------------------------------------------------------

struct PrData {
  std::vector<double> v;
  double similarity = 0;
  int tp = 0, fp = 0, fn = 0;
};

using OverlapFn = double (*)(const Object&, const Object&, int);

std::vector<double> getThresholds(std::vector<double>& v,
                                  double n_groundtruth) {
  std::vector<double> t;
  std::sort(v.begin(), v.end(), std::greater<double>());
  double current_recall = 0;
  for (size_t i = 0; i < v.size(); ++i) {
    const double l_recall = (double)(i + 1) / n_groundtruth;
    const double r_recall =
        i < v.size() - 1 ? (double)(i + 2) / n_groundtruth : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall)
        && i < v.size() - 1)
      continue;
    t.push_back(v[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

void cleanData(int current_class, const std::vector<Object>& gt,
               const std::vector<Object>& det,
               std::vector<int>& ignored_gt, std::vector<Object>& dc,
               std::vector<int>& ignored_det, int& n_gt, int difficulty) {
  for (const auto& g : gt) {
    const double height = g.box.y2 - g.box.y1;
    int valid_class;
    if (iequals(g.box.type, CLASS_NAMES[current_class]))
      valid_class = 1;
    else if (current_class == 1 && iequals(g.box.type, "Person_sitting"))
      valid_class = 0;
    else if (current_class == 0 && iequals(g.box.type, "Van"))
      valid_class = 0;
    else
      valid_class = -1;

    const bool ignore = g.occlusion > MAX_OCCLUSION[difficulty]
        || g.truncation > MAX_TRUNCATION[difficulty]
        || height < MIN_HEIGHT[difficulty];
    if (valid_class == 1 && !ignore) {
      ignored_gt.push_back(0);
      ++n_gt;
    } else if (valid_class == 0 || (ignore && valid_class == 1)) {
      ignored_gt.push_back(1);
    } else {
      ignored_gt.push_back(-1);
    }
  }
  for (const auto& g : gt)
    if (iequals(g.box.type, "DontCare")) dc.push_back(g);
  for (const auto& d : det) {
    const int valid_class =
        iequals(d.box.type, CLASS_NAMES[current_class]) ? 1 : -1;
    const double height = std::fabs(d.box.y1 - d.box.y2);
    if (height < MIN_HEIGHT[difficulty])
      ignored_det.push_back(1);
    else if (valid_class == 1)
      ignored_det.push_back(0);
    else
      ignored_det.push_back(-1);
  }
}

PrData computeStatistics(int current_class, const std::vector<Object>& gt,
                         const std::vector<Object>& det,
                         const std::vector<Object>& dc,
                         const std::vector<int>& ignored_gt,
                         const std::vector<int>& ignored_det,
                         bool compute_fp, OverlapFn boxoverlap, int metric,
                         bool compute_aos = false, double thresh = 0) {
  PrData stat;
  constexpr double NO_DETECTION = -10000000;
  std::vector<double> delta;
  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> ignored_threshold(det.size(), false);
  if (compute_fp)
    for (size_t i = 0; i < det.size(); ++i)
      if (det[i].score < thresh) ignored_threshold[i] = true;

  for (size_t i = 0; i < gt.size(); ++i) {
    if (ignored_gt[i] == -1) continue;
    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0;
    bool assigned_ignored_det = false;

    for (size_t j = 0; j < det.size(); ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
        continue;
      const double overlap = boxoverlap(det[j], gt[i], -1);
      if (!compute_fp && overlap > MIN_OVERLAP[metric][current_class]
          && det[j].score > valid_detection) {
        det_idx = (int)j;
        valid_detection = det[j].score;
      } else if (compute_fp
                 && overlap > MIN_OVERLAP[metric][current_class]
                 && (overlap > max_overlap || assigned_ignored_det)
                 && ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = (int)j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp
                 && overlap > MIN_OVERLAP[metric][current_class]
                 && valid_detection == NO_DETECTION
                 && ignored_det[j] == 1) {
        det_idx = (int)j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }

    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      ++stat.fn;
    } else if (valid_detection != NO_DETECTION
               && (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      ++stat.tp;
      stat.v.push_back(det[det_idx].score);
      if (compute_aos)
        delta.push_back(gt[i].box.alpha - det[det_idx].box.alpha);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t i = 0; i < det.size(); ++i)
      if (!(assigned[i] || ignored_det[i] == -1 || ignored_det[i] == 1
            || ignored_threshold[i]))
        ++stat.fp;
    int nstuff = 0;
    for (const auto& d : dc) {
      for (size_t j = 0; j < det.size(); ++j) {
        if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1
            || ignored_threshold[j])
          continue;
        const double overlap = boxoverlap(det[j], d, 0);
        if (overlap > MIN_OVERLAP[metric][current_class]) {
          assigned[j] = true;
          ++nstuff;
        }
      }
    }
    stat.fp -= nstuff;

    if (compute_aos) {
      std::vector<double> tmp(stat.fp, 0.0);
      for (double dl : delta) tmp.push_back((1.0 + std::cos(dl)) / 2.0);
      if (stat.tp > 0 || stat.fp > 0)
        stat.similarity =
            std::accumulate(tmp.begin(), tmp.end(), 0.0);
      else
        stat.similarity = -1;
    }
  }
  return stat;
}

bool evalClass(int current_class,
               const std::vector<std::vector<Object>>& groundtruth,
               const std::vector<std::vector<Object>>& detections,
               bool compute_aos, OverlapFn boxoverlap,
               std::vector<double>& precision, std::vector<double>& aos,
               int difficulty, int metric) {
  int n_gt = 0;
  std::vector<double> v;
  std::vector<std::vector<int>> ignored_gt, ignored_det;
  std::vector<std::vector<Object>> dontcare;

  for (size_t i = 0; i < groundtruth.size(); ++i) {
    std::vector<int> i_gt, i_det;
    std::vector<Object> dc;
    cleanData(current_class, groundtruth[i], detections[i], i_gt, dc,
              i_det, n_gt, difficulty);
    ignored_gt.push_back(i_gt);
    ignored_det.push_back(i_det);
    dontcare.push_back(dc);
    PrData pr = computeStatistics(current_class, groundtruth[i],
                                  detections[i], dc, i_gt, i_det, false,
                                  boxoverlap, metric);
    v.insert(v.end(), pr.v.begin(), pr.v.end());
  }

  std::vector<double> thresholds = getThresholds(v, n_gt);
  std::vector<PrData> pr(thresholds.size());
  for (size_t i = 0; i < groundtruth.size(); ++i) {
    for (size_t t = 0; t < thresholds.size(); ++t) {
      PrData tmp = computeStatistics(
          current_class, groundtruth[i], detections[i], dontcare[i],
          ignored_gt[i], ignored_det[i], true, boxoverlap, metric,
          compute_aos, thresholds[t]);
      pr[t].tp += tmp.tp;
      pr[t].fp += tmp.fp;
      pr[t].fn += tmp.fn;
      if (tmp.similarity != -1) pr[t].similarity += tmp.similarity;
    }
  }

  precision.assign((size_t)N_SAMPLE_PTS, 0);
  if (compute_aos) aos.assign((size_t)N_SAMPLE_PTS, 0);
  for (size_t i = 0; i < thresholds.size(); ++i) {
    precision[i] = pr[i].tp / (double)(pr[i].tp + pr[i].fp);
    if (compute_aos)
      aos[i] = pr[i].similarity / (double)(pr[i].tp + pr[i].fp);
  }
  for (size_t i = 0; i < thresholds.size(); ++i) {
    precision[i] =
        *std::max_element(precision.begin() + i, precision.end());
    if (compute_aos)
      aos[i] = *std::max_element(aos.begin() + i, aos.end());
  }
  return true;
}

// 11-point AP summary over the 41 samples (ref saveAndPlotPlots:718-722)
double apFrom41(const std::vector<double>& vals) {
  double sum = 0;
  for (size_t i = 0; i < vals.size(); i += 4) sum += vals[i];
  return sum / 11.0 * 100.0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <gt_dir> <result_dir>\n", argv[0]);
    return 1;
  }
  const std::string gt_dir = argv[1];
  const std::string result_dir = argv[2];

  // enumerate result files; each <frame>.txt pairs with gt_dir/<frame>.txt
  std::vector<std::string> frames;
  if (DIR* dp = opendir(result_dir.c_str())) {
    while (dirent* de = readdir(dp)) {
      std::string name = de->d_name;
      if (name.size() > 4 && name.substr(name.size() - 4) == ".txt"
          && name.rfind("stats_", 0) != 0)
        frames.push_back(name.substr(0, name.size() - 4));
    }
    closedir(dp);
  }
  std::sort(frames.begin(), frames.end());
  if (frames.empty()) {
    fprintf(stderr, "no detection files in %s\n", result_dir.c_str());
    return 1;
  }

  bool compute_aos = true;
  std::vector<bool> eval_image(NUM_CLASS, false),
      eval_ground(NUM_CLASS, false), eval_3d(NUM_CLASS, false);
  std::vector<std::vector<Object>> groundtruth, detections;
  for (const auto& f : frames) {
    bool ok1 = true, ok2 = true;
    groundtruth.push_back(loadGroundtruth(gt_dir + "/" + f + ".txt", ok1));
    detections.push_back(loadDetections(result_dir + "/" + f + ".txt",
                                        compute_aos, eval_image,
                                        eval_ground, eval_3d, ok2));
    if (!ok1) {
      fprintf(stderr, "missing ground truth %s/%s.txt\n", gt_dir.c_str(),
              f.c_str());
      return 1;
    }
  }

  struct Table {
    const char* name;
    OverlapFn fn;
    int metric;
    const std::vector<bool>* gate;
  };
  const Table tables[] = {
      {"detection", imageBoxOverlapObj, IMAGE, &eval_image},
      {"bev", groundBoxOverlap, GROUND, &eval_ground},
      {"3d", box3DOverlap, BOX3D, &eval_3d},
  };

  for (const auto& tb : tables) {
    for (int c = 0; c < NUM_CLASS; ++c) {
      if (!(*tb.gate)[c]) continue;
      std::vector<double> prec[3], aos[3];
      bool aos_here = compute_aos && tb.metric == IMAGE;
      for (int d = 0; d < 3; ++d)
        evalClass(c, groundtruth, detections, aos_here, tb.fn, prec[d],
                  aos[d], d, tb.metric);
      printf("AP %s %s %.6f %.6f %.6f\n", CLASS_NAMES[c], tb.name,
             apFrom41(prec[0]), apFrom41(prec[1]), apFrom41(prec[2]));
      // plot-data file: recall p_easy p_moderate p_hard
      const std::string out = result_dir + "/stats_" +
          CLASS_NAMES[c] + "_" + tb.name + ".txt";
      if (FILE* fp = fopen(out.c_str(), "w")) {
        for (int i = 0; i < (int)N_SAMPLE_PTS; ++i)
          fprintf(fp, "%f %f %f %f\n", i / (N_SAMPLE_PTS - 1.0),
                  prec[0][i], prec[1][i], prec[2][i]);
        fclose(fp);
      }
      if (aos_here)
        printf("AOS %s %.6f %.6f %.6f\n", CLASS_NAMES[c],
               apFrom41(aos[0]), apFrom41(aos[1]), apFrom41(aos[2]));
    }
  }
  return 0;
}
