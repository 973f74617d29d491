// pjrt_serving — Python-free scoring of an exported serving artifact.
//
// Loads a PJRT C-API plugin (.so), compiles the StableHLO bytecode that
// `Trainer.export_serving` / `serving/bundle.py` produced, uploads a batch
// from raw tensors, executes on the device, and verifies the scores against
// the expected outputs recorded at export time. This is the C++ serving
// shim the TPU build provides where the reference serves through a mutable
// torch module's Python predict loop (reference model/IModel.py:272-308):
// a deployment container needs only this binary, the plugin .so, and the
// bundle directory — no Python interpreter.
//
// Everything is driven by a bundle manifest (see serving/bundle.py):
//
//   plugin /opt/axon/libaxon_pjrt.so
//   env TPU_SKIP_MDS_QUERY 1
//   opt s topology v5e:1x1x1
//   opt i remote_compile 1
//   opt s session_id @fresh          <- shim substitutes a unique id
//   program module.stablehlo.bc
//   compile_options compile_options.pb
//   input f32 4096,13 input_0.bin dense_features
//   expected f32 4096 expected_0.bin
//   tolerance 1e-4
//
// Build:   make -C pytorchrec_tpu/native/serving   (or see Makefile)
// Run:     ./pjrt_serve <bundle_dir> [--reps N] [--dry]
//
// The same binary works against any PJRT plugin (libtpu.so on a real TPU
// host, the axon tunnel plugin on this machine) — the plugin path and its
// client-create options live in the bundle, not in the code.

#include <dlfcn.h>
#include <unistd.h>

#include <algorithm>
#include <cctype>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

// ---------------------------------------------------------------- utilities

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_serve: FATAL: %s\n", msg.c_str());
  std::exit(1);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Die("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// PJRT error -> message, then free it.
void CheckPjrt(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  Die(std::string(what) + ": " + msg);
}

void AwaitEvent(const PJRT_Api* api, PJRT_Event* event, const char* what) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args aargs;
  std::memset(&aargs, 0, sizeof(aargs));
  aargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aargs.event = event;
  CheckPjrt(api, api->PJRT_Event_Await(&aargs), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  api->PJRT_Event_Destroy(&dargs);
}

// ------------------------------------------------------------------ manifest

struct TensorSpec {
  std::string dtype;             // f32 | i32 | i64 | u32 | f64
  std::vector<int64_t> dims;
  std::string file;              // relative to bundle dir
  std::string name;              // informational (inputs only)
};

struct Option {
  char type;  // 's' | 'i' | 'b' | 'f'
  std::string key;
  std::string value;
};

struct Manifest {
  std::string plugin;
  std::vector<std::pair<std::string, std::string>> env;
  std::vector<Option> options;
  std::string program;
  std::string compile_options;
  std::vector<TensorSpec> inputs;
  std::vector<TensorSpec> expected;
  double tolerance = 1e-4;
};

std::vector<int64_t> ParseDims(const std::string& csv) {
  std::vector<int64_t> dims;
  if (csv == "scalar") return dims;
  std::stringstream ss(csv);
  std::string part;
  while (std::getline(ss, part, ',')) dims.push_back(std::stoll(part));
  return dims;
}

Manifest ParseManifest(const std::string& dir) {
  Manifest m;
  std::ifstream f(dir + "/manifest.txt");
  if (!f) Die("cannot open " + dir + "/manifest.txt");
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::stringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "plugin") {
      ss >> m.plugin;
    } else if (kind == "env") {
      std::string k, v;
      ss >> k >> v;
      m.env.emplace_back(k, v);
    } else if (kind == "opt") {
      Option o;
      std::string t;
      ss >> t >> o.key >> o.value;
      o.type = t[0];
      m.options.push_back(o);
    } else if (kind == "program") {
      ss >> m.program;
    } else if (kind == "compile_options") {
      ss >> m.compile_options;
    } else if (kind == "input" || kind == "expected") {
      TensorSpec t;
      std::string dims;
      ss >> t.dtype >> dims >> t.file;
      ss >> t.name;  // optional
      t.dims = ParseDims(dims);
      (kind == "input" ? m.inputs : m.expected).push_back(t);
    } else if (kind == "tolerance") {
      ss >> m.tolerance;
    } else {
      Die("unknown manifest line kind: " + kind);
    }
  }
  if (m.plugin.empty() || m.program.empty()) Die("manifest missing plugin/program");
  return m;
}

PJRT_Buffer_Type DtypeToPjrt(const std::string& d) {
  if (d == "f32") return PJRT_Buffer_Type_F32;
  if (d == "f64") return PJRT_Buffer_Type_F64;
  if (d == "i32") return PJRT_Buffer_Type_S32;
  if (d == "i64") return PJRT_Buffer_Type_S64;
  if (d == "u32") return PJRT_Buffer_Type_U32;
  if (d == "i8") return PJRT_Buffer_Type_S8;
  if (d == "u8") return PJRT_Buffer_Type_U8;
  if (d == "bf16") return PJRT_Buffer_Type_BF16;
  Die("unsupported dtype " + d);
}

size_t DtypeBytes(const std::string& d) {
  if (d == "f64" || d == "i64") return 8;
  if (d == "f32" || d == "i32" || d == "u32") return 4;
  if (d == "bf16") return 2;
  if (d == "i8" || d == "u8") return 1;
  Die("unsupported dtype " + d);
}

size_t NumElements(const TensorSpec& t) {
  size_t n = 1;
  for (int64_t d : t.dims) n *= static_cast<size_t>(d);
  return n;
}

std::string FreshSessionId() {
  // uuid4-shaped id from /dev/urandom (the axon terminal only needs
  // uniqueness, but keep the canonical format in case it parses it).
  unsigned char b[16];
  std::ifstream ur("/dev/urandom", std::ios::binary);
  ur.read(reinterpret_cast<char*>(b), sizeof(b));
  if (!ur) Die("cannot read /dev/urandom for session id");
  b[6] = (b[6] & 0x0f) | 0x40;  // version 4
  b[8] = (b[8] & 0x3f) | 0x80;  // variant 10
  char out[37];
  std::snprintf(out, sizeof(out),
                "%02x%02x%02x%02x-%02x%02x-%02x%02x-%02x%02x-"
                "%02x%02x%02x%02x%02x%02x",
                b[0], b[1], b[2], b[3], b[4], b[5], b[6], b[7], b[8], b[9],
                b[10], b[11], b[12], b[13], b[14], b[15]);
  return std::string(out);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <bundle_dir> [--reps N] [--dry]\n", argv[0]);
    return 2;
  }
  const std::string dir = argv[1];
  int reps = 10;
  bool dry = false;
  for (int i = 2; i < argc; ++i) {
    if (std::strcmp(argv[i], "--reps") == 0 && i + 1 < argc) reps = std::atoi(argv[++i]);
    if (std::strcmp(argv[i], "--dry") == 0) dry = true;
  }

  Manifest m = ParseManifest(dir);
  std::printf("bundle: %s\n  plugin: %s\n  program: %s (%zu inputs, %zu outputs)\n",
              dir.c_str(), m.plugin.c_str(), m.program.c_str(), m.inputs.size(),
              m.expected.size());

  // Load tensors up front so --dry validates the whole bundle.
  std::vector<std::string> input_data, expected_data;
  for (const auto& t : m.inputs) {
    std::string data = ReadFile(dir + "/" + t.file);
    if (data.size() != NumElements(t) * DtypeBytes(t.dtype))
      Die("input " + t.file + " size mismatch");
    input_data.push_back(std::move(data));
  }
  for (const auto& t : m.expected) {
    std::string data = ReadFile(dir + "/" + t.file);
    if (data.size() != NumElements(t) * DtypeBytes(t.dtype))
      Die("expected " + t.file + " size mismatch");
    expected_data.push_back(std::move(data));
  }
  std::string program = ReadFile(dir + "/" + m.program);
  std::string compile_options =
      m.compile_options.empty() ? std::string() : ReadFile(dir + "/" + m.compile_options);

  if (dry) {
    std::printf("DRY OK: manifest + %zu input / %zu expected tensors parsed, "
                "program %zu bytes, compile options %zu bytes\n",
                input_data.size(), expected_data.size(), program.size(),
                compile_options.size());
    return 0;
  }

  for (const auto& [k, v] : m.env) setenv(k.c_str(), v.c_str(), /*overwrite=*/0);

  // ------------------------------------------------------------- plugin
  void* handle = dlopen(m.plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) Die(std::string("dlopen: ") + dlerror());
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) Die("plugin exports no GetPjrtApi");
  const PJRT_Api* api = get_api();
  std::printf("plugin PJRT C API version: %d.%d\n",
              api->pjrt_api_version.major_version,
              api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init_args;
  std::memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CheckPjrt(api, api->PJRT_Plugin_Initialize(&init_args), "Plugin_Initialize");

  // ------------------------------------------------------------- client
  std::vector<PJRT_NamedValue> create_options;
  std::vector<std::string> string_storage;  // keep c_str()s alive
  string_storage.reserve(m.options.size() * 2 + 2);
  std::vector<int64_t> int_storage;
  int_storage.reserve(m.options.size());
  for (const auto& o : m.options) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    string_storage.push_back(o.key);
    nv.name = string_storage.back().c_str();
    nv.name_size = o.key.size();
    if (o.type == 's') {
      std::string v = (o.value == "@fresh") ? FreshSessionId() : o.value;
      string_storage.push_back(v);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = string_storage.back().c_str();
      nv.value_size = v.size();
    } else if (o.type == 'i') {
      nv.type = PJRT_NamedValue_kInt64;
      int_storage.push_back(std::stoll(o.value));
      nv.int64_value = int_storage.back();
      nv.value_size = 1;
    } else if (o.type == 'b') {
      nv.type = PJRT_NamedValue_kBool;
      nv.bool_value = (o.value == "1" || o.value == "true");
      nv.value_size = 1;
    } else if (o.type == 'f') {
      nv.type = PJRT_NamedValue_kFloat;
      nv.float_value = std::stof(o.value);
      nv.value_size = 1;
    } else {
      Die(std::string("bad option type ") + o.type);
    }
    create_options.push_back(nv);
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = create_options.data();
  cargs.num_options = create_options.size();
  auto t_client0 = std::chrono::steady_clock::now();
  CheckPjrt(api, api->PJRT_Client_Create(&cargs), "Client_Create");
  PJRT_Client* client = cargs.client;
  auto t_client1 = std::chrono::steady_clock::now();
  std::printf("client created in %.1f ms\n",
              std::chrono::duration<double, std::milli>(t_client1 - t_client0).count());

  PJRT_Client_AddressableDevices_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  CheckPjrt(api, api->PJRT_Client_AddressableDevices(&dargs), "AddressableDevices");
  if (dargs.num_addressable_devices == 0) Die("no addressable devices");
  PJRT_Device* device = dargs.addressable_devices[0];
  std::printf("addressable devices: %zu\n", dargs.num_addressable_devices);

  // ------------------------------------------------------------- compile
  PJRT_Program prog;
  std::memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = program.data();
  prog.code_size = program.size();
  static const char kFormat[] = "mlir";
  prog.format = kFormat;
  prog.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp_args;
  std::memset(&comp_args, 0, sizeof(comp_args));
  comp_args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp_args.client = client;
  comp_args.program = &prog;
  comp_args.compile_options = compile_options.data();
  comp_args.compile_options_size = compile_options.size();
  auto t_comp0 = std::chrono::steady_clock::now();
  CheckPjrt(api, api->PJRT_Client_Compile(&comp_args), "Client_Compile");
  PJRT_LoadedExecutable* exec = comp_args.executable;
  auto t_comp1 = std::chrono::steady_clock::now();
  std::printf("compiled in %.1f ms\n",
              std::chrono::duration<double, std::milli>(t_comp1 - t_comp0).count());

  // -------------------------------------------------------------- upload
  std::vector<PJRT_Buffer*> arg_buffers;
  for (size_t i = 0; i < m.inputs.size(); ++i) {
    const TensorSpec& t = m.inputs[i];
    PJRT_Client_BufferFromHostBuffer_Args bargs;
    std::memset(&bargs, 0, sizeof(bargs));
    bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bargs.client = client;
    bargs.data = input_data[i].data();
    bargs.type = DtypeToPjrt(t.dtype);
    bargs.dims = t.dims.data();
    bargs.num_dims = t.dims.size();
    bargs.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bargs.device = device;
    CheckPjrt(api, api->PJRT_Client_BufferFromHostBuffer(&bargs),
              "BufferFromHostBuffer");
    AwaitEvent(api, bargs.done_with_host_buffer, "host buffer transfer");
    arg_buffers.push_back(bargs.buffer);
  }

  // -------------------------------------------------------------- execute
  const size_t num_outputs = m.expected.size();
  std::vector<PJRT_Buffer*> output_row(num_outputs, nullptr);
  PJRT_Buffer** output_lists[1] = {output_row.data()};
  PJRT_Buffer* const* argument_lists[1] = {arg_buffers.data()};
  PJRT_Event* device_complete[1] = {nullptr};

  PJRT_ExecuteOptions eopts;
  std::memset(&eopts, 0, sizeof(eopts));
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  auto run_once = [&]() {
    PJRT_LoadedExecutable_Execute_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    eargs.executable = exec;
    eargs.options = &eopts;
    eargs.argument_lists = argument_lists;
    eargs.num_devices = 1;
    eargs.num_args = arg_buffers.size();
    eargs.output_lists = output_lists;
    eargs.device_complete_events = device_complete;
    CheckPjrt(api, api->PJRT_LoadedExecutable_Execute(&eargs), "Execute");
    AwaitEvent(api, device_complete[0], "device execution");
  };

  auto destroy_outputs = [&]() {
    for (PJRT_Buffer*& b : output_row) {
      if (b == nullptr) continue;
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      CheckPjrt(api, api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy");
      b = nullptr;
    }
  };

  run_once();  // correctness execution (outputs kept for verification)

  // ------------------------------------------------------------ verify
  bool all_ok = true;
  for (size_t i = 0; i < num_outputs; ++i) {
    const TensorSpec& t = m.expected[i];
    size_t nbytes = NumElements(t) * DtypeBytes(t.dtype);
    std::vector<char> host(nbytes);
    PJRT_Buffer_ToHostBuffer_Args hargs;
    std::memset(&hargs, 0, sizeof(hargs));
    hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    hargs.src = output_row[i];
    hargs.dst = host.data();
    hargs.dst_size = nbytes;
    CheckPjrt(api, api->PJRT_Buffer_ToHostBuffer(&hargs), "ToHostBuffer");
    AwaitEvent(api, hargs.event, "device-to-host copy");

    if (t.dtype != "f32") Die("verification only implemented for f32 outputs");
    const float* got = reinterpret_cast<const float*>(host.data());
    const float* want = reinterpret_cast<const float*>(expected_data[i].data());
    double max_abs = 0.0;
    for (size_t j = 0; j < NumElements(t); ++j)
      max_abs = std::max(max_abs, std::fabs(double(got[j]) - double(want[j])));
    bool ok = max_abs <= m.tolerance;
    all_ok = all_ok && ok;
    std::printf("output %zu: max|diff| = %.3g (tolerance %.3g) -> %s\n", i,
                max_abs, m.tolerance, ok ? "MATCH" : "MISMATCH");
  }

  // ------------------------------------------------------------ latency
  destroy_outputs();
  std::vector<double> lat_ms;
  for (int r = 0; r < reps; ++r) {
    auto t0 = std::chrono::steady_clock::now();
    run_once();
    auto t1 = std::chrono::steady_clock::now();
    lat_ms.push_back(std::chrono::duration<double, std::milli>(t1 - t0).count());
    destroy_outputs();
  }
  if (!lat_ms.empty()) {
    std::sort(lat_ms.begin(), lat_ms.end());
    std::printf("execute latency over %d reps: p50 %.2f ms, min %.2f ms, max %.2f ms\n",
                reps, lat_ms[lat_ms.size() / 2], lat_ms.front(), lat_ms.back());
  }

  // ------------------------------------------------------------ cleanup
  for (PJRT_Buffer* b : arg_buffers) {
    PJRT_Buffer_Destroy_Args bd;
    std::memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bd.buffer = b;
    api->PJRT_Buffer_Destroy(&bd);
  }
  PJRT_LoadedExecutable_Destroy_Args ed;
  std::memset(&ed, 0, sizeof(ed));
  ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ed.executable = exec;
  api->PJRT_LoadedExecutable_Destroy(&ed);
  PJRT_Client_Destroy_Args cd;
  std::memset(&cd, 0, sizeof(cd));
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  api->PJRT_Client_Destroy(&cd);

  std::printf("%s\n", all_ok ? "SERVING VERIFICATION PASSED" : "SERVING VERIFICATION FAILED");
  return all_ok ? 0 : 1;
}
