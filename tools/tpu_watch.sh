#!/bin/bash
# Poll the axon tunnel; run the queued chain once it's back. Give up after 9h.
deadline=$(( $(date +%s) + 32400 ))
while [ $(date +%s) -lt $deadline ]; do
  code=$(curl -s -m 3 -o /dev/null -w '%{http_code}' http://127.0.0.1:8083/ 2>/dev/null)
  if [ "$code" != "000" ] && [ -n "$code" ]; then
    echo "tunnel up (http $code) at $(date)" >> /tmp/tpu_chain.log
    bash tools/tpu_reconnect_chain.sh >> /tmp/tpu_chain.log 2>&1
    exit 0
  fi
  sleep 60
done
echo "watcher gave up at $(date)" >> /tmp/tpu_chain.log
exit 1
