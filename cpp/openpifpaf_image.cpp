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

#include <tensorflow/c/c_api.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

// native IO layer (openpifpaf_tpu/csrc/pifpaf_io.cpp)
extern "C" int pifpaf_load_batch(const char** paths, int n, int long_edge,
                                 int out_h, int out_w, float* out,
                                 int* scaled_sizes, int n_threads);

namespace {

void check(TF_Status* status, const char* what) {
    if (TF_GetCode(status) != TF_OK) {
        std::fprintf(stderr, "error: %s: %s\n", what, TF_Message(status));
        std::exit(1);
    }
}

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

    TF_Status* status = TF_NewStatus();
    TF_Graph* graph = TF_NewGraph();
    TF_SessionOptions* opts = TF_NewSessionOptions();
    TF_Buffer* run_opts = nullptr;
    const char* tags[] = {"serve"};

    TF_Session* session = TF_LoadSessionFromSavedModel(
        opts, run_opts, args.model_dir.c_str(), tags, 1, graph, nullptr,
        status);
    check(status, "loading SavedModel");

    TF_Operation* input_op =
        TF_GraphOperationByName(graph, args.input_name.c_str());
    TF_Operation* output_op =
        TF_GraphOperationByName(graph, args.output_name.c_str());
    if (input_op == nullptr || output_op == nullptr) {
        std::fprintf(stderr,
                     "error: graph ops not found (input %s, output %s); "
                     "override with --input-name/--output-name\n",
                     args.input_name.c_str(), args.output_name.c_str());
        return 1;
    }

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

        TF_Output input_port{input_op, 0};
        TF_Output output_ports[2] = {{output_op, 0}, {output_op, 1}};
        TF_Tensor* outputs[2] = {nullptr, nullptr};

        TF_SessionRun(session, nullptr,
                      &input_port, &input, 1,
                      output_ports, outputs, 2,
                      nullptr, 0, nullptr, status);
        check(status, "running session");

        // poses (1, P, K, 4: v,x,y,s), keep (1, P)
        TF_Tensor* poses_t = outputs[0];
        TF_Tensor* keep_t = outputs[1];
        if (TF_NumDims(poses_t) == 3 || TF_NumDims(keep_t) == 4) {
            // signature outputs may be ordered (keep, poses): normalize
            TF_Tensor* tmp = poses_t;
            poses_t = keep_t;
            keep_t = tmp;
        }
        const int n_poses = int(TF_Dim(poses_t, 1));
        const int n_kp = int(TF_Dim(poses_t, 2));
        const float* poses = static_cast<const float*>(TF_TensorData(poses_t));
        const void* keep_data = TF_TensorData(keep_t);
        const TF_DataType keep_type = TF_TensorType(keep_t);

        std::printf("{\"file\": \"%s\", \"predictions\": [", path.c_str());
        bool first = true;
        for (int p = 0; p < n_poses; ++p) {
            bool keep = false;
            if (keep_type == TF_BOOL) {
                keep = static_cast<const uint8_t*>(keep_data)[p] != 0;
            } else if (keep_type == TF_INT32) {
                keep = static_cast<const int32_t*>(keep_data)[p] != 0;
            } else {
                keep = static_cast<const float*>(keep_data)[p] > 0.5f;
            }
            if (!keep) continue;

            const float* pose = poses + size_t(p) * n_kp * 4;
            float score = 0.0f;
            int n_vis = 0;
            for (int k = 0; k < n_kp; ++k) {
                if (pose[k * 4] > 0.0f) {
                    score += pose[k * 4];
                    ++n_vis;
                }
            }
            if (n_vis == 0) continue;
            score /= float(n_kp);
            if (score < args.instance_threshold) continue;

            if (!first) std::printf(", ");
            first = false;
            std::printf("{\"score\": %.4f, \"keypoints\": [", score);
            for (int k = 0; k < n_kp; ++k) {
                const float v = pose[k * 4 + 0];
                const float x = pose[k * 4 + 1] * rescale_x;
                const float y = pose[k * 4 + 2] * rescale_y;
                std::printf("%s%.2f, %.2f, %.3f", k ? ", " : "", x, y, v);
            }
            std::printf("]}");
        }
        std::printf("]}\n");

        TF_DeleteTensor(input);
        TF_DeleteTensor(outputs[0]);
        TF_DeleteTensor(outputs[1]);
    }

    TF_CloseSession(session, status);
    TF_DeleteSession(session, status);
    TF_DeleteSessionOptions(opts);
    TF_DeleteGraph(graph);
    TF_DeleteStatus(status);
    return 0;
}
