// Pixel-level confusion-matrix accumulator.
//
// Native counterpart of the reference's Cython inner loop
// (reference: src/lib/datasets/evaluation/cityscapesscripts/evaluation/
// addToConfusionMatrix.pyx + _impl.c), used by the semantic-labeling
// evaluator.  Exposed with C linkage and consumed from Python via ctypes
// (centerpoly_tpu/eval/native.py).
//
// Build: see cpp/Makefile (produces libcenterpoly_native.so).

#include <cstdint>

extern "C" {

// Accumulate prediction/GT label pairs into confMatrix[dim][dim].
// prediction/groundTruth: row-major uint8 label images of n pixels.
void add_to_confusion_matrix(const uint8_t* prediction,
                             const uint8_t* ground_truth,
                             uint64_t n_pixels,
                             uint64_t* conf_matrix,
                             uint32_t dim) {
    for (uint64_t i = 0; i < n_pixels; ++i) {
        const uint32_t gt = ground_truth[i];
        const uint32_t pr = prediction[i];
        if (gt < dim && pr < dim) {
            ++conf_matrix[static_cast<uint64_t>(gt) * dim + pr];
        }
    }
}

}  // extern "C"
