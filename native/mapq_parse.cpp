// Columnar parser for MetaMaps-format mapping files with mapping qualities
// (14 space-separated fields per line; reference output of
// addMappingQualities, computeMap.hpp:1297-1380). Returns the raw file
// buffer plus per-line numeric columns, interned contig IDs, and read-group
// boundaries so the Python EM loader (metamaps_tpu/engine/em.py) skips
// per-line string splitting. Build: g++ -O2 -shared -fPIC.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {
struct MapqData {
  char* buf;  // whole file contents
  int64_t buf_len;
  int64_t n_lines;
  int64_t n_reads;
  int64_t n_contigs;
  int64_t* line_beg;      // [n_lines] offsets into buf (line stripped of \r\n)
  int64_t* line_end;      // [n_lines]
  int64_t* read_of_line;  // [n_lines] read-group index
  int32_t* contig_idx;    // [n_lines] index into the contig table
  int64_t* read_len;      // [n_lines] field 1
  int64_t* start;         // [n_lines] field 7
  int64_t* stop;          // [n_lines] field 8
  double* identity;       // [n_lines] field 9 / 100
  double* mapq;           // [n_lines] field 13 (0.0 when unparseable)
  int64_t* contig_beg;    // [n_contigs] offsets into buf
  int64_t* contig_end;    // [n_contigs]
  int64_t* read_id_beg;   // [n_reads] offsets of field 0 of the group head
  int64_t* read_id_end;   // [n_reads]
};

int mapq_parse(const char* path, MapqData* out);
void mapq_free(MapqData* out);
}

namespace {

template <typename T>
T* steal(std::vector<T>& v) {
  T* p = static_cast<T*>(malloc(sizeof(T) * (v.empty() ? 1 : v.size())));
  if (p && !v.empty()) memcpy(p, v.data(), sizeof(T) * v.size());
  return p;
}

// Python float(): the whole token must parse (no trailing junk). The file
// buffer is NUL-terminated and fields end at ' '/'\n'/'\r', at which strtod
// stops anyway, so parsing runs in place without copying.
bool parse_double_full(const char* b, const char* e, double* val) {
  if (b == e) return false;
  char* endp = nullptr;
  double v = strtod(b, &endp);
  if (endp != e) return false;
  *val = v;
  return true;
}

bool parse_i64_full(const char* b, const char* e, int64_t* val) {
  if (b == e) return false;
  char* endp = nullptr;
  long long v = strtoll(b, &endp, 10);
  if (endp != e) return false;
  *val = v;
  return true;
}

}  // namespace

extern "C" int mapq_parse(const char* path, MapqData* out) {
  memset(out, 0, sizeof(*out));
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(malloc(sz + 1));
  if (!buf || (sz > 0 && fread(buf, 1, sz, f) != static_cast<size_t>(sz))) {
    free(buf);
    fclose(f);
    return 1;
  }
  buf[sz] = '\0';  // lets strtod/strtoll run in place on the final field
  fclose(f);

  std::vector<int64_t> line_beg, line_end, read_of_line, read_len, start, stop;
  std::vector<int64_t> contig_beg, contig_end, read_id_beg, read_id_end;
  std::vector<int32_t> contig_idx;
  std::vector<double> identity, mapq;
  std::unordered_map<std::string, int32_t> contig_map;

  int64_t prev_id_beg = -1, prev_id_end = -1;
  int64_t n_reads = 0;
  int rc = 0;

  for (int64_t pos = 0; pos < sz;) {
    int64_t eol = pos;
    while (eol < sz && buf[eol] != '\n') eol++;
    int64_t b = pos, e = eol;
    pos = eol + 1;
    while (e > b && buf[e - 1] == '\r') e--;  // rstrip("\n").rstrip("\r")
    if (e == b) continue;                     // skip blank lines

    // field k spans [fb[k], fe[k]) — split at every single space,
    // matching Python str.split(" ") (empty fields preserved)
    int64_t fb[14], fe[14];
    int nf = 0;
    int64_t fs = b;
    for (int64_t i = b; i <= e && nf < 14; i++) {
      if (i == e || buf[i] == ' ') {
        fb[nf] = fs;
        fe[nf] = i;
        nf++;
        fs = i + 1;
      }
    }
    if (nf < 14) {
      rc = 2;  // not a mapping-qualities file — caller falls back
      break;
    }

    int64_t rl, st, sp;
    double idv;
    if (!parse_i64_full(buf + fb[1], buf + fe[1], &rl) ||
        !parse_i64_full(buf + fb[7], buf + fe[7], &st) ||
        !parse_i64_full(buf + fb[8], buf + fe[8], &sp) ||
        !parse_double_full(buf + fb[9], buf + fe[9], &idv)) {
      rc = 3;  // malformed numeric field — fall back for the Python error
      break;
    }
    double q;
    if (!parse_double_full(buf + fb[13], buf + fe[13], &q)) q = 0.0;

    std::string contig(buf + fb[5], buf + fe[5]);
    auto it = contig_map.find(contig);
    int32_t ci;
    if (it == contig_map.end()) {
      ci = static_cast<int32_t>(contig_map.size());
      contig_map.emplace(std::move(contig), ci);
      contig_beg.push_back(fb[5]);
      contig_end.push_back(fe[5]);
    } else {
      ci = it->second;
    }

    int64_t id_len = fe[0] - fb[0];
    bool same = prev_id_beg >= 0 && id_len == prev_id_end - prev_id_beg &&
                memcmp(buf + fb[0], buf + prev_id_beg, id_len) == 0;
    if (!same) {
      read_id_beg.push_back(fb[0]);
      read_id_end.push_back(fe[0]);
      n_reads++;
    }
    prev_id_beg = fb[0];
    prev_id_end = fe[0];

    line_beg.push_back(b);
    line_end.push_back(e);
    read_of_line.push_back(n_reads - 1);
    contig_idx.push_back(ci);
    read_len.push_back(rl);
    start.push_back(st);
    stop.push_back(sp);
    identity.push_back(idv / 100.0);
    mapq.push_back(q);
  }

  if (rc != 0) {
    free(buf);
    return rc;
  }

  out->buf = buf;
  out->buf_len = sz;
  out->n_lines = static_cast<int64_t>(line_beg.size());
  out->n_reads = n_reads;
  out->n_contigs = static_cast<int64_t>(contig_beg.size());
  out->line_beg = steal(line_beg);
  out->line_end = steal(line_end);
  out->read_of_line = steal(read_of_line);
  out->contig_idx = steal(contig_idx);
  out->read_len = steal(read_len);
  out->start = steal(start);
  out->stop = steal(stop);
  out->identity = steal(identity);
  out->mapq = steal(mapq);
  out->contig_beg = steal(contig_beg);
  out->contig_end = steal(contig_end);
  out->read_id_beg = steal(read_id_beg);
  out->read_id_end = steal(read_id_end);
  return 0;
}

extern "C" void mapq_free(MapqData* out) {
  free(out->buf);
  free(out->line_beg);
  free(out->line_end);
  free(out->read_of_line);
  free(out->contig_idx);
  free(out->read_len);
  free(out->start);
  free(out->stop);
  free(out->identity);
  free(out->mapq);
  free(out->contig_beg);
  free(out->contig_end);
  free(out->read_id_beg);
  free(out->read_id_end);
  memset(out, 0, sizeof(*out));
}
