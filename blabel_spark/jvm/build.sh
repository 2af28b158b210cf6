#!/bin/sh
# Build blabel-udfs.jar against the installed pyspark's jars.
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
javac -encoding UTF-8 -cp "$JARS/*" BlabelMurmur128.java
jar cf blabel-udfs.jar BlabelMurmur128.class
rm -f BlabelMurmur128.class
echo "built $(pwd)/blabel-udfs.jar"
