"""Kill leftover Spark JVM/python workers from timed-out bench runs."""
import subprocess
import sys

subprocess.run(["pkill", "-9", "-x", "java"], capture_output=True)
for pat in ("pyspark-shell", "pyspark.daemon"):
    subprocess.run(["pkill", "-9", "-f", pat], capture_output=True)
out = subprocess.run(["uptime"], capture_output=True, text=True).stdout
print(out.strip())
sys.exit(0)
