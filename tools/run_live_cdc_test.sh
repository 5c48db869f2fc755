#!/usr/bin/env bash
# Provision a scratch Postgres (initdb + pg_ctl), run the LIVE CDC
# integration test against it, tear it down. Mirrors the reference's
# server requirements (docker-compose.yaml:10 command flags +
# setup_source_db1.sql REPLICA IDENTITY FULL, applied by the test
# itself): wal_level=logical, spare replication slots, trust auth.
#
# Works with stock Postgres server binaries (pg_ctl/initdb on PATH or
# under /usr/lib/postgresql/*/bin). No psycopg2 needed — the test
# falls back to the bundled pure-Python protocol client.
#
# Usage: tools/run_live_cdc_test.sh [extra pytest args]
set -euo pipefail

PGBIN="$(dirname "$(command -v initdb || echo /usr/lib/postgresql/15/bin/x)")"
[ -x "$PGBIN/initdb" ] || PGBIN=$(ls -d /usr/lib/postgresql/*/bin 2>/dev/null | tail -1)
[ -x "$PGBIN/initdb" ] || { echo "no Postgres server binaries found" >&2; exit 1; }

WORK=$(mktemp -d /tmp/cdc_live_pg.XXXXXX)
PORT=${CDC_TEST_PG_PORT:-54329}

# Postgres refuses to run as root: in root contexts (CI containers),
# run the SERVER as an unprivileged user; the test client stays as-is.
AS_USER=""
if [ "$(id -u)" = 0 ]; then
    PGUSER_OS=${CDC_TEST_OS_USER:-pgtest}
    id "$PGUSER_OS" >/dev/null 2>&1 || useradd -M -s /bin/sh "$PGUSER_OS"
    chown -R "$PGUSER_OS" "$WORK"
    AS_USER="runuser -u $PGUSER_OS --"
fi

trap '$AS_USER "$PGBIN/pg_ctl" -D "$WORK/data" -m immediate stop >/dev/null 2>&1 || true; rm -rf "$WORK"' EXIT

# CDC_TEST_PG_AUTH=scram-sha-256 (or md5/password) provisions password
# auth instead of trust, exercising the fallback client's SASL/md5
# handshakes against a real server.
AUTH=${CDC_TEST_PG_AUTH:-trust}
PGPASS=""
PWFILE_ARGS=()
if [ "$AUTH" != trust ]; then
    PGPASS="cdc-test-secret"
    printf '%s\n' "$PGPASS" > "$WORK/pwfile"
    [ -n "$AS_USER" ] && chown "$PGUSER_OS" "$WORK/pwfile"
    PWFILE_ARGS=(--pwfile="$WORK/pwfile")
fi
# UTF8 encoding (not the C-locale SQL_ASCII default): ICU collations —
# used by the text-PK collation live test — require a UTF8 database.
# Fall back to the bare form on hosts without a C.utf8 locale.
$AS_USER "$PGBIN/initdb" -D "$WORK/data" -U postgres -A "$AUTH" "${PWFILE_ARGS[@]}" \
    -E UTF8 --locale=C.utf8 >/dev/null 2>&1 \
  || $AS_USER "$PGBIN/initdb" -D "$WORK/data" -U postgres -A "$AUTH" "${PWFILE_ARGS[@]}" >/dev/null
cat >> "$WORK/data/postgresql.conf" <<CONF
wal_level = logical
max_wal_senders = 10
max_replication_slots = 10
listen_addresses = '127.0.0.1'
port = $PORT
unix_socket_directories = '$WORK'
CONF

$AS_USER "$PGBIN/pg_ctl" -D "$WORK/data" -l "$WORK/pg.log" -w start >/dev/null
echo "scratch Postgres $("$PGBIN/postgres" --version | awk '{print $3}') on 127.0.0.1:$PORT (wal_level=logical)"

POSTGRES_CDC_TEST_DSN="host=127.0.0.1 port=$PORT dbname=postgres user=postgres password=$PGPASS" \
    python -m pytest tests/test_postgres_cdc_live.py -v "$@"
