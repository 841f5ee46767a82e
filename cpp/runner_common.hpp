// Shared plumbing for the standalone C++ runners (image + video):
// TF C API session setup, serving-signature output normalization, pose
// extraction and JSON emission. Keeping this in one place guarantees the
// two CLIs agree on conventions (output-port order heuristic, keep-mask
// dtypes, score formula, coordinate rescaling).

#pragma once

#include <tensorflow/c/c_api.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

namespace pifpaf {

inline void check(TF_Status* status, const char* what) {
    if (TF_GetCode(status) != TF_OK) {
        std::fprintf(stderr, "error: %s: %s\n", what, TF_Message(status));
        std::exit(1);
    }
}

struct Model {
    TF_Status* status = nullptr;
    TF_Graph* graph = nullptr;
    TF_SessionOptions* opts = nullptr;
    TF_Session* session = nullptr;
    TF_Operation* input_op = nullptr;
    TF_Operation* output_op = nullptr;

    void load(const std::string& model_dir, const std::string& input_name,
              const std::string& output_name) {
        status = TF_NewStatus();
        graph = TF_NewGraph();
        opts = TF_NewSessionOptions();
        const char* tags[] = {"serve"};
        session = TF_LoadSessionFromSavedModel(
            opts, nullptr, model_dir.c_str(), tags, 1, graph, nullptr,
            status);
        check(status, "loading SavedModel");
        input_op = TF_GraphOperationByName(graph, input_name.c_str());
        output_op = TF_GraphOperationByName(graph, output_name.c_str());
        if (input_op == nullptr || output_op == nullptr) {
            std::fprintf(stderr,
                         "error: graph ops not found (input %s, output %s); "
                         "override with --input-name/--output-name\n",
                         input_name.c_str(), output_name.c_str());
            std::exit(1);
        }
    }

    // input: (1, h, w, 3) float tensor; takes ownership, fills outputs[2]
    void run(TF_Tensor* input, TF_Tensor* outputs[2]) {
        TF_Output input_port{input_op, 0};
        TF_Output output_ports[2] = {{output_op, 0}, {output_op, 1}};
        TF_SessionRun(session, nullptr, &input_port, &input, 1,
                      output_ports, outputs, 2, nullptr, 0, nullptr, status);
        check(status, "running session");
    }

    void close() {
        TF_CloseSession(session, status);
        TF_DeleteSession(session, status);
        TF_DeleteSessionOptions(opts);
        TF_DeleteGraph(graph);
        TF_DeleteStatus(status);
    }
};

struct Pose {
    float score;
    std::vector<float> kps;  // x, y, v triples in original pixels
};

// Extract kept poses from the decoder outputs. Outputs are
// poses (1, P, K, 4: v,x,y,s) and keep (1, P), in either order — the
// signature does not guarantee port ordering, so normalize by rank.
inline std::vector<Pose> extract_poses(
        TF_Tensor* outputs[2], float rescale_x, float rescale_y,
        float instance_threshold, int* n_kp_out) {
    TF_Tensor* poses_t = outputs[0];
    TF_Tensor* keep_t = outputs[1];
    if (TF_NumDims(poses_t) == 3 || TF_NumDims(keep_t) == 4) {
        TF_Tensor* tmp = poses_t;
        poses_t = keep_t;
        keep_t = tmp;
    }
    const int n_poses = int(TF_Dim(poses_t, 1));
    const int n_kp = int(TF_Dim(poses_t, 2));
    *n_kp_out = n_kp;
    const float* poses = static_cast<const float*>(TF_TensorData(poses_t));
    const void* keep_data = TF_TensorData(keep_t);
    const TF_DataType keep_type = TF_TensorType(keep_t);

    std::vector<Pose> found;
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
        if (score < instance_threshold) continue;

        Pose out;
        out.score = score;
        out.kps.resize(size_t(n_kp) * 3);
        for (int k = 0; k < n_kp; ++k) {
            out.kps[k * 3 + 0] = pose[k * 4 + 1] * rescale_x;
            out.kps[k * 3 + 1] = pose[k * 4 + 2] * rescale_y;
            out.kps[k * 3 + 2] = pose[k * 4 + 0];
        }
        found.push_back(std::move(out));
    }
    return found;
}

// {"score": s, "keypoints": [x, y, v, ...]} list body (no surrounding key)
inline void print_predictions(const std::vector<Pose>& found, int n_kp) {
    std::printf("[");
    for (size_t p = 0; p < found.size(); ++p) {
        if (p) std::printf(", ");
        std::printf("{\"score\": %.4f, \"keypoints\": [", found[p].score);
        for (int k = 0; k < n_kp; ++k) {
            std::printf("%s%.2f, %.2f, %.3f", k ? ", " : "",
                        found[p].kps[k * 3], found[p].kps[k * 3 + 1],
                        found[p].kps[k * 3 + 2]);
        }
        std::printf("]}");
    }
    std::printf("]");
}

}  // namespace pifpaf
