#!/bin/sh
# Build the reference renderer against the embree_shim (the mirror's
# prebuilt Embree binaries are stripped). Sources are read from the
# read-only reference tree; all artifacts land in this directory.
# -O3 -march=native is *more* generous than the reference's own
# RelWithDebInfo (-O2) config, biasing the measured baseline upward
# (conservative for our speedup claims).
set -e
cd "$(dirname "$0")"
REF=/root/reference
mkdir -p build
CXXFLAGS="-O3 -march=native -std=c++17 -w -I$REF/embree/include -I$REF/src"
for f in camera filter image intersection light load_serialized material \
         medium parallel parse_obj parse_scene phase_function render scene \
         shape table_dist transform volume; do
  out=build/$f.o
  if [ ! -f "$out" ] || [ "$REF/src/$f.cpp" -nt "$out" ]; then
    echo "CXX $f.cpp"; g++ $CXXFLAGS -c "$REF/src/$f.cpp" -o "$out" &
  fi
done
wait
g++ $CXXFLAGS -c "$REF/src/3rdparty/pugixml.cpp" -o build/pugixml.o
gcc -O3 -march=native -w -c "$REF/src/3rdparty/miniz.c" -o build/miniz.o
g++ $CXXFLAGS -c embree_shim.cpp -o build/embree_shim.o
g++ $CXXFLAGS -c "$REF/src/main.cpp" -o build/main.o
g++ build/*.o -o lajolla_ref -lpthread
echo "built: $(pwd)/lajolla_ref"
