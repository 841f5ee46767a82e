// Standalone C++ deployment runner: JPEG -> poses, no Python.
//
// Counterpart of the reference's LibTorch demo (reference cpp/cli_image.cpp:
// loads a TorchScript EncoderDecoder and runs images through it). Here the
// model is a TF SavedModel produced by
//   python -m openpifpaf_tpu.export --format savedmodel --with-decoder ...
// whose serving signature maps a preprocessed image batch directly to pose
// tensors; this binary does JPEG decode + preprocessing with the same native
// code as the Python pipeline (../openpifpaf_tpu/csrc/pifpaf_io.cpp) and
// runs the model through the TensorFlow C API (XLA on CPU or TPU).
//
// Usage:
//   openpifpaf-tpu-image --model <savedmodel_dir> \
//       [--input-height 481 --input-width 641] [--long-edge 641] \
//       image1.jpg [image2.jpg ...]
//
// Prints one JSON line per image:
//   {"file": "...", "predictions": [{"score": s, "keypoints": [x,y,v, ...]}]}

#include "runner_common.hpp"

#include <cstdio>
#include <string>
#include <vector>

// native IO layer (openpifpaf_tpu/csrc/pifpaf_io.cpp)
extern "C" int pifpaf_load_batch(const char** paths, int n, int long_edge,
                                 int out_h, int out_w, float* out,
                                 int* scaled_sizes, int n_threads);

namespace {

struct Args {
    std::string model_dir;
    std::string input_name = "serving_default_image";
    std::string output_name = "StatefulPartitionedCall";
    int input_height = 481;
    int input_width = 641;
    int long_edge = 0;  // 0: fit into input box without upscaling
    float instance_threshold = 0.15f;
    std::vector<std::string> images;
};

Args parse_args(int argc, char** argv) {
    Args a;
    for (int i = 1; i < argc; ++i) {
        const std::string arg = argv[i];
        auto next = [&]() -> const char* {
            if (i + 1 >= argc) {
                std::fprintf(stderr, "missing value for %s\n", arg.c_str());
                std::exit(2);
            }
            return argv[++i];
        };
        if (arg == "--model") a.model_dir = next();
        else if (arg == "--input-name") a.input_name = next();
        else if (arg == "--output-name") a.output_name = next();
        else if (arg == "--input-height") a.input_height = std::atoi(next());
        else if (arg == "--input-width") a.input_width = std::atoi(next());
        else if (arg == "--long-edge") a.long_edge = std::atoi(next());
        else if (arg == "--instance-threshold")
            a.instance_threshold = std::atof(next());
        else if (arg == "--help" || arg == "-h") {
            std::printf("usage: openpifpaf-tpu-image --model <savedmodel> "
                        "[options] images...\n");
            std::exit(0);
        } else {
            a.images.push_back(arg);
        }
    }
    if (a.model_dir.empty() || a.images.empty()) {
        std::fprintf(stderr,
                     "usage: openpifpaf-tpu-image --model <savedmodel> "
                     "[options] images...\n");
        std::exit(2);
    }
    return a;
}

}  // namespace

int main(int argc, char** argv) {
    Args args = parse_args(argc, argv);

    pifpaf::Model model;
    model.load(args.model_dir, args.input_name, args.output_name);

    const int h = args.input_height;
    const int w = args.input_width;

    for (const std::string& path : args.images) {
        // native decode + preprocess into a (1, h, w, 3) float32 tensor
        const int64_t dims[4] = {1, h, w, 3};
        TF_Tensor* input = TF_AllocateTensor(
            TF_FLOAT, dims, 4, sizeof(float) * size_t(h) * w * 3);
        int scaled[4] = {0, 0, 0, 0};
        const char* paths[] = {path.c_str()};
        const int failures = pifpaf_load_batch(
            paths, 1, args.long_edge, h, w,
            static_cast<float*>(TF_TensorData(input)), scaled, 0);
        if (failures != 0) {
            std::fprintf(stderr, "error: could not load %s\n", path.c_str());
            TF_DeleteTensor(input);
            continue;
        }
        // map network coordinates back to original pixels
        const float rescale_x = scaled[1] > 1
            ? float(scaled[3] - 1) / float(scaled[1] - 1) : 1.0f;
        const float rescale_y = scaled[0] > 1
            ? float(scaled[2] - 1) / float(scaled[0] - 1) : 1.0f;

        TF_Tensor* outputs[2] = {nullptr, nullptr};
        model.run(input, outputs);

        int n_kp = 0;
        const std::vector<pifpaf::Pose> found = pifpaf::extract_poses(
            outputs, rescale_x, rescale_y, args.instance_threshold, &n_kp);

        std::printf("{\"file\": \"%s\", \"predictions\": ", path.c_str());
        pifpaf::print_predictions(found, n_kp);
        std::printf("}\n");

        TF_DeleteTensor(input);
        TF_DeleteTensor(outputs[0]);
        TF_DeleteTensor(outputs[1]);
    }

    model.close();
    return 0;
}
