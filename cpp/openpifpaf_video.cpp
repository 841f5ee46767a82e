// Standalone C++ video runner: video/webcam -> poses, no Python.
//
// Counterpart of the reference's LibTorch video demo (reference
// cpp/cli_video.cpp: OpenCV capture -> TorchScript EncoderDecoder ->
// rendered frames). Here the model is a TF SavedModel produced by
//   python -m openpifpaf_tpu.export --format savedmodel --with-decoder ...
// and frames come from OpenCV VideoCapture (file path or camera index).
//
// Usage:
//   openpifpaf-tpu-video --model <savedmodel_dir> --source <file|camindex>
//       [--input-height 481 --input-width 641]
//       [--video-output out.avi] [--max-frames N]
//
// Prints one JSON line per frame:
//   {"frame": i, "predictions": [{"score": s, "keypoints": [x,y,v, ...]}]}
// With --video-output, additionally writes frames with skeleton overlays.

#include <tensorflow/c/c_api.h>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

// COCO person skeleton (1-based pairs), plugins/coco/constants.py
constexpr int kSkeleton[][2] = {
    {16, 14}, {14, 12}, {17, 15}, {15, 13}, {12, 13}, {6, 12}, {7, 13},
    {6, 7},   {6, 8},   {7, 9},   {8, 10},  {9, 11},  {2, 3},  {1, 2},
    {1, 3},   {2, 4},   {3, 5},   {4, 6},   {5, 7}};

void check(TF_Status* status, const char* what) {
    if (TF_GetCode(status) != TF_OK) {
        std::fprintf(stderr, "error: %s: %s\n", what, TF_Message(status));
        std::exit(1);
    }
}

struct Args {
    std::string model_dir;
    std::string source;
    std::string video_output;
    std::string input_name = "serving_default_image";
    std::string output_name = "StatefulPartitionedCall";
    int input_height = 481;
    int input_width = 641;
    int max_frames = 0;  // 0 = until stream ends
    float instance_threshold = 0.15f;
    float keypoint_threshold = 0.15f;
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
        else if (arg == "--source") a.source = next();
        else if (arg == "--video-output") a.video_output = next();
        else if (arg == "--input-name") a.input_name = next();
        else if (arg == "--output-name") a.output_name = next();
        else if (arg == "--input-height") a.input_height = std::atoi(next());
        else if (arg == "--input-width") a.input_width = std::atoi(next());
        else if (arg == "--max-frames") a.max_frames = std::atoi(next());
        else if (arg == "--instance-threshold")
            a.instance_threshold = std::atof(next());
        else if (arg == "--keypoint-threshold")
            a.keypoint_threshold = std::atof(next());
        else if (arg == "--help" || arg == "-h") {
            std::printf("usage: openpifpaf-tpu-video --model <savedmodel> "
                        "--source <file|camindex> [options]\n");
            std::exit(0);
        } else {
            std::fprintf(stderr, "unknown argument %s\n", arg.c_str());
            std::exit(2);
        }
    }
    if (a.model_dir.empty() || a.source.empty()) {
        std::fprintf(stderr,
                     "usage: openpifpaf-tpu-video --model <savedmodel> "
                     "--source <file|camindex> [options]\n");
        std::exit(2);
    }
    return a;
}

struct Pose {
    float score;
    std::vector<float> kps;  // x, y, v triples in original pixels
};

}  // namespace

int main(int argc, char** argv) {
    Args args = parse_args(argc, argv);

    TF_Status* status = TF_NewStatus();
    TF_Graph* graph = TF_NewGraph();
    TF_SessionOptions* opts = TF_NewSessionOptions();
    const char* tags[] = {"serve"};
    TF_Session* session = TF_LoadSessionFromSavedModel(
        opts, nullptr, args.model_dir.c_str(), tags, 1, graph, nullptr,
        status);
    check(status, "loading SavedModel");

    TF_Operation* input_op =
        TF_GraphOperationByName(graph, args.input_name.c_str());
    TF_Operation* output_op =
        TF_GraphOperationByName(graph, args.output_name.c_str());
    if (input_op == nullptr || output_op == nullptr) {
        std::fprintf(stderr,
                     "error: graph ops not found (input %s, output %s)\n",
                     args.input_name.c_str(), args.output_name.c_str());
        return 1;
    }

    cv::VideoCapture cap;
    bool is_camera = !args.source.empty()
        && args.source.find_first_not_of("0123456789") == std::string::npos;
    if (is_camera) {
        cap.open(std::atoi(args.source.c_str()));
    } else {
        cap.open(args.source);
    }
    if (!cap.isOpened()) {
        std::fprintf(stderr, "error: cannot open source %s\n",
                     args.source.c_str());
        return 1;
    }

    cv::VideoWriter writer;
    const int h = args.input_height;
    const int w = args.input_width;

    cv::Mat frame_bgr, resized, rgb;
    int frame_i = 0;
    while (cap.read(frame_bgr)) {
        if (args.max_frames && frame_i >= args.max_frames) break;

        // fit the frame into (w, h) preserving aspect ratio
        const double scale = std::min(double(w) / frame_bgr.cols,
                                      double(h) / frame_bgr.rows);
        const int sw = std::max(1, int(frame_bgr.cols * scale));
        const int sh = std::max(1, int(frame_bgr.rows * scale));
        cv::resize(frame_bgr, resized, cv::Size(sw, sh), 0, 0,
                   cv::INTER_LINEAR);
        cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
        const float rescale_x = sw > 1
            ? float(frame_bgr.cols - 1) / float(sw - 1) : 1.0f;
        const float rescale_y = sh > 1
            ? float(frame_bgr.rows - 1) / float(sh - 1) : 1.0f;

        const int64_t dims[4] = {1, h, w, 3};
        TF_Tensor* input = TF_AllocateTensor(
            TF_FLOAT, dims, 4, sizeof(float) * size_t(h) * w * 3);
        float* data = static_cast<float*>(TF_TensorData(input));
        // ImageNet normalization, zero padding outside the scaled frame
        // (matches openpifpaf_tpu/csrc/pifpaf_io.cpp)
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                float* px = data + (size_t(y) * w + x) * 3;
                if (y < sh && x < sw) {
                    const cv::Vec3b& v = rgb.at<cv::Vec3b>(y, x);
                    for (int c = 0; c < 3; ++c) {
                        px[c] = (v[c] / 255.0f - kMean[c]) / kStd[c];
                    }
                } else {
                    for (int c = 0; c < 3; ++c) {
                        px[c] = (0.0f - kMean[c]) / kStd[c];
                    }
                }
            }
        }

        TF_Output input_port{input_op, 0};
        TF_Output output_ports[2] = {{output_op, 0}, {output_op, 1}};
        TF_Tensor* outputs[2] = {nullptr, nullptr};
        TF_SessionRun(session, nullptr, &input_port, &input, 1,
                      output_ports, outputs, 2, nullptr, 0, nullptr, status);
        check(status, "running session");

        TF_Tensor* poses_t = outputs[0];
        TF_Tensor* keep_t = outputs[1];
        if (TF_NumDims(poses_t) == 3 || TF_NumDims(keep_t) == 4) {
            TF_Tensor* tmp = poses_t;
            poses_t = keep_t;
            keep_t = tmp;
        }
        const int n_poses = int(TF_Dim(poses_t, 1));
        const int n_kp = int(TF_Dim(poses_t, 2));
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
            if (score < args.instance_threshold) continue;
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

        std::printf("{\"frame\": %d, \"predictions\": [", frame_i);
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
        std::printf("]}\n");
        std::fflush(stdout);

        if (!args.video_output.empty()) {
            if (!writer.isOpened()) {
                writer.open(args.video_output,
                            cv::VideoWriter::fourcc('M', 'J', 'P', 'G'),
                            cap.get(cv::CAP_PROP_FPS) > 0
                                ? cap.get(cv::CAP_PROP_FPS) : 25.0,
                            frame_bgr.size());
            }
            for (const Pose& pose : found) {
                const float th = args.keypoint_threshold;
                if (n_kp == 17) {
                    for (const auto& edge : kSkeleton) {
                        const int a = edge[0] - 1, b = edge[1] - 1;
                        if (pose.kps[a * 3 + 2] <= th
                            || pose.kps[b * 3 + 2] <= th) continue;
                        cv::line(frame_bgr,
                                 {int(pose.kps[a * 3]), int(pose.kps[a * 3 + 1])},
                                 {int(pose.kps[b * 3]), int(pose.kps[b * 3 + 1])},
                                 {0, 255, 0}, 2);
                    }
                }
                for (int k = 0; k < n_kp; ++k) {
                    if (pose.kps[k * 3 + 2] <= th) continue;
                    cv::circle(frame_bgr,
                               {int(pose.kps[k * 3]), int(pose.kps[k * 3 + 1])},
                               3, {0, 0, 255}, -1);
                }
            }
            writer.write(frame_bgr);
        }

        TF_DeleteTensor(input);
        TF_DeleteTensor(outputs[0]);
        TF_DeleteTensor(outputs[1]);
        ++frame_i;
    }

    TF_CloseSession(session, status);
    TF_DeleteSession(session, status);
    TF_DeleteSessionOptions(opts);
    TF_DeleteGraph(graph);
    TF_DeleteStatus(status);
    return 0;
}
