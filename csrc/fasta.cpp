// Native FASTA reader for smithwaterman_tpu.
//
// Host-side IO belongs in native code once sweeps stream hundreds of
// thousands of records (the reference's production engines parse FASTA in
// Rust, rust/sequence_alignment/src/sequence_alignment.rs:823-889; the
// Perl/Python engines re-read per run).  This parser replicates the exact
// tolerance rules of smithwaterman_tpu/io/fasta.py (itself cited to the
// reference), byte for byte:
//
//   * a line containing '>' ANYWHERE starts a new record; when the '>' is
//     not at column 0 a warning is recorded (the Python wrapper writes the
//     reference's message to sys.stderr so capture/tests see it);
//   * header: whitespace-trim the whole line, skip a '>' only at trimmed
//     column 0, name = first whitespace-delimited run, desc = the rest
//     with exactly one separator char consumed (later spaces are kept);
//   * a record with neither name nor sequence is dropped;
//   * sequence lines: whitespace removed (retain_ws keeps interior blanks,
//     removing only CR/LF);
//   * \n, \r\n and lone \r all terminate lines (Python opens the file in
//     universal-newline text mode).
//
// Interface (ctypes): parse returns an opaque handle; accessors hand back
// pointers into arena-owned strings, freed with sw_fasta_free.

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

namespace {

inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

struct Record {
  std::string name, desc, seq;
};

struct FastaResult {
  std::vector<Record> records;
  std::vector<int64_t> warn_pos;  // column of each mid-line '>' warning
};

// Exact port of io/fasta.py::_parse_header.
void parse_header(const std::string& line, std::string* name,
                  std::string* desc) {
  size_t b = 0, e = line.size();
  while (b < e && is_ws(line[b])) b++;
  while (e > b && is_ws(line[e - 1])) e--;
  name->clear();
  desc->clear();
  bool in_name = true;
  for (size_t i = b; i < e; i++) {
    char ch = line[i];
    if (in_name) {
      if (i == b && ch == '>') continue;
      if (is_ws(ch)) {
        if (!name->empty()) in_name = false;
        continue;
      }
      name->push_back(ch);
    } else {
      desc->push_back(ch);
    }
  }
}

}  // namespace

extern "C" {

FastaResult* sw_fasta_parse(const char* path, int64_t retain_ws,
                            int64_t* n_records) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::string buf;
  {
    char chunk[1 << 16];
    size_t got;
    while ((got = std::fread(chunk, 1, sizeof chunk, f)) > 0)
      buf.append(chunk, got);
  }
  std::fclose(f);

  auto* res = new FastaResult();
  std::string name, desc, seq;
  // a record with neither name nor sequence is dropped (parity:
  // io/fasta.py::parse_fasta flush rule)
  auto flush = [&]() {
    if (!seq.empty() || !name.empty())
      res->records.push_back({name, desc, seq});
  };

  size_t i = 0, n = buf.size();
  while (i < n) {
    // one line, universal-newline style
    size_t j = i;
    while (j < n && buf[j] != '\n' && buf[j] != '\r') j++;
    std::string line = buf.substr(i, j - i);
    if (j < n && buf[j] == '\r' && j + 1 < n && buf[j + 1] == '\n') j++;
    i = j + 1;

    size_t pos = line.find('>');
    if (pos != std::string::npos) {
      flush();
      if (pos > 0) res->warn_pos.push_back((int64_t)pos);
      parse_header(line, &name, &desc);
      seq.clear();
    } else {
      for (char c : line) {
        if (retain_ws ? (c != '\r' && c != '\n') : !is_ws(c))
          seq.push_back(c);
      }
    }
  }
  flush();
  *n_records = (int64_t)res->records.size();
  return res;
}

void sw_fasta_record(FastaResult* res, int64_t idx, const char** name,
                     int64_t* name_len, const char** desc, int64_t* desc_len,
                     const char** seq, int64_t* seq_len) {
  const Record& r = res->records[(size_t)idx];
  *name = r.name.data();
  *name_len = (int64_t)r.name.size();
  *desc = r.desc.data();
  *desc_len = (int64_t)r.desc.size();
  *seq = r.seq.data();
  *seq_len = (int64_t)r.seq.size();
}

int64_t sw_fasta_n_warnings(FastaResult* res) {
  return (int64_t)res->warn_pos.size();
}

int64_t sw_fasta_warning_pos(FastaResult* res, int64_t idx) {
  return res->warn_pos[(size_t)idx];
}

void sw_fasta_free(FastaResult* res) { delete res; }

}  // extern "C"
