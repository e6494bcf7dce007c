// Native FASTA/FASTQ reader for metamaps_tpu (kseq-equivalent semantics:
// record name = token up to first whitespace; multi-line FASTA; 4-line
// FASTQ; gzip-transparent via zlib). Parses a whole file into flat buffers
// that the Python side views as numpy arrays:
//   seq      : concatenated sequence bytes
//   seq_off  : n+1 offsets into seq
//   names    : concatenated name bytes ('\0'-separated)
//   name_off : n+1 offsets into names
// Compiled as a plain C ABI shared library, loaded with ctypes.
#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Buffers {
  std::vector<uint8_t> seq;
  std::vector<int64_t> seq_off{0};
  std::vector<char> names;
  std::vector<int64_t> name_off{0};
};

class GzLineReader {
 public:
  explicit GzLineReader(const char* path) : f_(gzopen(path, "rb")) {
    buf_.resize(1 << 20);
  }
  ~GzLineReader() {
    if (f_) gzclose(f_);
  }
  bool ok() const { return f_ != nullptr; }

  // Returns false at EOF. Line is stripped of trailing \r\n.
  bool next(std::vector<char>& line) {
    line.clear();
    while (true) {
      if (pos_ >= len_) {
        len_ = gzread(f_, buf_.data(), (unsigned)buf_.size());
        pos_ = 0;
        if (len_ <= 0) return !line.empty();
      }
      char* start = buf_.data() + pos_;
      char* nl = (char*)memchr(start, '\n', len_ - pos_);
      if (nl) {
        line.insert(line.end(), start, nl);
        pos_ = (nl - buf_.data()) + 1;
        while (!line.empty() && (line.back() == '\r')) line.pop_back();
        return true;
      }
      line.insert(line.end(), start, buf_.data() + len_);
      pos_ = len_;
    }
  }

 private:
  gzFile f_;
  std::vector<char> buf_;
  int pos_ = 0;
  int len_ = 0;
};

void push_name(Buffers& b, const std::vector<char>& header, size_t skip) {
  size_t end = skip;
  while (end < header.size() && header[end] != ' ' && header[end] != '\t')
    end++;
  b.names.insert(b.names.end(), header.begin() + skip, header.begin() + end);
  b.name_off.push_back((int64_t)b.names.size());
}

}  // namespace

extern "C" {

struct FastxData {
  uint8_t* seq;
  int64_t* seq_off;
  char* names;
  int64_t* name_off;
  int64_t n;
};

// Returns 0 on success, nonzero error code otherwise.
int fastx_read(const char* path, FastxData* out) {
  GzLineReader rd(path);
  if (!rd.ok()) return 1;

  Buffers b;
  std::vector<char> line;
  if (!rd.next(line)) return 2;  // empty file
  bool fastq = !line.empty() && line[0] == '@';

  if (fastq) {
    while (true) {
      if (line.empty()) {
        if (!rd.next(line)) break;
        continue;
      }
      if (line[0] != '@') return 3;
      push_name(b, line, 1);
      if (!rd.next(line)) return 4;
      b.seq.insert(b.seq.end(), line.begin(), line.end());
      b.seq_off.push_back((int64_t)b.seq.size());
      if (!rd.next(line)) return 5;  // '+'
      if (line.empty() || line[0] != '+') return 6;
      if (!rd.next(line)) return 7;  // quality (ignored)
      if (!rd.next(line)) break;
    }
  } else {
    bool have = true;
    bool in_record = false;
    while (have) {
      if (!line.empty() && line[0] == '>') {
        if (in_record) b.seq_off.push_back((int64_t)b.seq.size());
        push_name(b, line, 1);
        in_record = true;
      } else if (in_record && !line.empty()) {
        b.seq.insert(b.seq.end(), line.begin(), line.end());
      }
      have = rd.next(line);
    }
    if (in_record) b.seq_off.push_back((int64_t)b.seq.size());
  }

  out->n = (int64_t)b.name_off.size() - 1;
  out->seq = (uint8_t*)malloc(b.seq.size() ? b.seq.size() : 1);
  memcpy(out->seq, b.seq.data(), b.seq.size());
  out->seq_off = (int64_t*)malloc(b.seq_off.size() * sizeof(int64_t));
  memcpy(out->seq_off, b.seq_off.data(), b.seq_off.size() * sizeof(int64_t));
  out->names = (char*)malloc(b.names.size() ? b.names.size() : 1);
  memcpy(out->names, b.names.data(), b.names.size());
  out->name_off = (int64_t*)malloc(b.name_off.size() * sizeof(int64_t));
  memcpy(out->name_off, b.name_off.data(), b.name_off.size() * sizeof(int64_t));
  return 0;
}

void fastx_free(FastxData* d) {
  free(d->seq);
  free(d->seq_off);
  free(d->names);
  free(d->name_off);
  d->seq = nullptr;
  d->seq_off = nullptr;
  d->names = nullptr;
  d->name_off = nullptr;
  d->n = 0;
}

}  // extern "C"
