package graft.server

/** Embedded admin console. The reference mounts its lattice React app at
  * `/` plus SPA routes and static assets (`reference/http_handler.go:
  * 486,613-624` newRouter; `:903-930` statikHandler). This build has no JS
  * toolchain, so the console is ONE self-contained HTML page (inline CSS +
  * vanilla JS, zero external assets) over the facade's existing endpoints:
  * `/schema` (table browser), `POST /sql` and `POST /index/{i}/query`
  * (query runner), `/metrics.json` and `/query-history` (ops panel).
  *
  * Route surface mirrors the reference's mounts: `/`, `/favicon.png`,
  * `/favicon.svg`, `/manifest.json`, the `/static` prefix, and
  * [[LatticeRoutes]] — the SPA paths statikHandler rewrites to `/` so a
  * browser refresh at `/query` doesn't 404 (`http_handler.go:921-927`).
  * A curl user-agent gets the reference's 404 welcome line instead of
  * HTML (`http_handler.go:904-911`).
  */
object AdminUi {

  /** `reference/http_handler.go:486` latticeRoutes. */
  val LatticeRoutes: Seq[String] =
    Seq("/tables", "/query", "/querybuilder", "/signin")

  /** `http_handler.go:905`, with our engine name/version. */
  def curlWelcome(version: String): String =
    s"Welcome. graft $version is running. Try the Web UI by visiting " +
      "this URL in your browser."

  val manifest: String =
    """{"short_name":"graft","name":"graft console","start_url":"/","display":"standalone"}"""

  val faviconSvg: String =
    """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 16 16">""" +
      """<rect width="16" height="16" rx="3" fill="#1a7f64"/>""" +
      """<rect x="3" y="8" width="2" height="5" fill="#fff"/>""" +
      """<rect x="7" y="5" width="2" height="8" fill="#fff"/>""" +
      """<rect x="11" y="3" width="2" height="10" fill="#fff"/></svg>"""

  def page(version: String): String =
    s"""<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>graft console</title>
<link rel="icon" href="/favicon.svg" type="image/svg+xml">
<style>
:root { --bg:#11151a; --panel:#1a2026; --line:#2a323a; --fg:#d7dee6;
        --dim:#8b98a5; --acc:#2fbf9b; --err:#e06c75; }
* { box-sizing: border-box; }
body { margin:0; background:var(--bg); color:var(--fg);
       font:14px/1.45 -apple-system, "Segoe UI", Roboto, sans-serif; }
header { display:flex; align-items:baseline; gap:12px; padding:10px 18px;
         border-bottom:1px solid var(--line); background:var(--panel); }
header h1 { font-size:16px; margin:0; color:var(--acc); }
header .v { color:var(--dim); font-size:12px; }
main { display:grid; grid-template-columns: 260px 1fr; gap:14px;
       padding:14px 18px; align-items:start; }
.panel { background:var(--panel); border:1px solid var(--line);
         border-radius:6px; padding:12px; }
.panel h2 { margin:0 0 8px; font-size:12px; text-transform:uppercase;
            letter-spacing:.08em; color:var(--dim); }
#tables .tbl { cursor:pointer; padding:2px 4px; border-radius:4px; }
#tables .tbl:hover { background:#222a33; }
#tables .fields { color:var(--dim); font-size:12px; margin:0 0 6px 14px;
                  display:none; }
textarea { width:100%; height:96px; background:#0d1116; color:var(--fg);
           border:1px solid var(--line); border-radius:4px; padding:8px;
           font:13px/1.4 ui-monospace, Menlo, Consolas, monospace; }
.row { display:flex; gap:8px; margin:8px 0; align-items:center; }
select,input[type=text] { background:#0d1116; color:var(--fg);
  border:1px solid var(--line); border-radius:4px; padding:5px 8px; }
button { background:var(--acc); color:#08261e; font-weight:600;
         border:0; border-radius:4px; padding:6px 16px; cursor:pointer; }
button:hover { filter:brightness(1.1); }
table.res { border-collapse:collapse; width:100%; margin-top:8px;
            font:12px ui-monospace, Menlo, Consolas, monospace; }
table.res th, table.res td { border:1px solid var(--line); padding:3px 8px;
                             text-align:left; }
table.res th { background:#222a33; position:sticky; top:0; }
#result-wrap { max-height:420px; overflow:auto; }
#error { color:var(--err); white-space:pre-wrap;
         font:12px ui-monospace, monospace; }
#metrics td:last-child { text-align:right; }
.cols { display:grid; grid-template-columns:1fr 1fr; gap:14px;
        margin-top:14px; }
.dim { color:var(--dim); }
</style>
</head>
<body>
<header><h1>graft console</h1><span class="v">$version</span>
  <span class="v dim" id="stat"></span>
  <input type="password" id="tok" placeholder="bearer token (if auth on)"
    style="margin-left:auto;width:210px" autocomplete="off"></header>
<main>
  <div class="panel"><h2>Tables</h2><div id="tables" class="dim">loading…</div></div>
  <div>
    <div class="panel">
      <h2>Query</h2>
      <textarea id="q" spellcheck="false"
        placeholder="SELECT ... &#10;or PQL: Count(Row(f=1))"></textarea>
      <div class="row">
        <select id="mode"><option value="sql">SQL</option>
          <option value="pql">PQL</option></select>
        <input type="text" id="pqlidx" placeholder="index (PQL only)"
          style="display:none">
        <button id="run">Run</button>
        <span class="dim" id="took"></span>
      </div>
      <div id="error"></div>
      <div id="result-wrap"><table class="res" id="result"></table></div>
    </div>
    <div class="cols">
      <div class="panel"><h2>Metrics</h2>
        <table class="res" id="metrics"></table></div>
      <div class="panel"><h2>Query history</h2>
        <table class="res" id="history"></table></div>
      <div class="panel"><h2>Active queries</h2>
        <table class="res" id="active"></table></div>
    </div>
  </div>
</main>
<script>
const $$ = id => document.getElementById(id);
// all console requests carry the bearer token when one is set (the facade
// takes "Authorization: Bearer <jwt>" when auth is enabled); kept in
// localStorage so a refresh doesn't drop the session
function gf(url, opts) {
  const o = opts || {};
  let t = '';
  try { t = localStorage.getItem('graft-token') || ''; } catch (_) {}
  if (t) o.headers = Object.assign({}, o.headers,
    { 'Authorization': 'Bearer ' + t });
  return fetch(url, o);
}
function cells(tr, tag, vals) {
  for (const v of vals) {
    const c = document.createElement(tag);
    c.textContent = v === null ? 'null' : String(v);
    tr.appendChild(c);
  }
}
async function loadSchema() {
  try {
    const j = await (await gf('/schema')).json();
    const host = $$('tables'); host.textContent = '';
    host.classList.remove('dim');
    for (const ix of (j.indexes || [])) {
      const d = document.createElement('div');
      d.className = 'tbl'; d.textContent = ix.name;
      const f = document.createElement('div');
      f.className = 'fields';
      f.textContent = (ix.fields || [])
        .map(x => x.name + ' : ' + ((x.options||{}).type || '')).join('\\n');
      f.style.whiteSpace = 'pre';
      d.onclick = () => {
        f.style.display = f.style.display === 'block' ? 'none' : 'block';
      };
      host.appendChild(d); host.appendChild(f);
    }
    if (!(j.indexes || []).length) host.textContent = '(no tables)';
  } catch (e) { $$('tables').textContent = 'schema error: ' + e; }
}
function renderResult(j) {
  const t = $$('result'); t.textContent = '';
  const fields = ((j.schema || {}).fields || []).map(f => f.name);
  const hr = document.createElement('tr');
  cells(hr, 'th', fields); t.appendChild(hr);
  for (const row of (j.data || [])) {
    const tr = document.createElement('tr');
    cells(tr, 'td', row); t.appendChild(tr);
  }
  $$('took').textContent = (j.data || []).length + ' rows';
}
async function run() {
  $$('error').textContent = ''; $$('result').textContent = '';
  $$('took').textContent = '…';
  const q = $$('q').value, mode = $$('mode').value;
  const url = mode === 'sql' ? '/sql'
    : '/index/' + encodeURIComponent($$('pqlidx').value || '') + '/query';
  try {
    const r = await gf(url, { method: 'POST', body: q });
    const text = await r.text();
    let j; try { j = JSON.parse(text); } catch (_) { j = null; }
    if (!r.ok || (j && j.error)) {
      $$('error').textContent = (j && j.error) ? j.error : text;
      $$('took').textContent = '';
      return;
    }
    if (j && j.schema) renderResult(j);
    else if (j && j.results) { // PQL wire shape
      $$('error').textContent = '';
      $$('result').textContent = '';
      const pre = document.createElement('tr');
      cells(pre, 'td', [JSON.stringify(j.results)]);
      $$('result').appendChild(pre);
      $$('took').textContent = 'ok';
    } else $$('error').textContent = text;
  } catch (e) { $$('error').textContent = String(e); }
}
function spanText(s, d) {
  let out = '  '.repeat(d) + s.name + ' ' + ((s.ns || 0) / 1e6).toFixed(1) + ' ms';
  for (const c of (s.children || [])) out += '\\n' + spanText(c, d + 1);
  return out;
}
async function loadOps() {
  try {
    const m = await (await gf('/metrics.json')).json();
    const t = $$('metrics'); t.textContent = '';
    for (const [k, v] of Object.entries(m.local || {})) {
      const tr = document.createElement('tr');
      cells(tr, 'td', [k, v]); t.appendChild(tr);
    }
  } catch (e) {}
  try {
    const h = await (await gf('/query-history')).json();
    const t = $$('history'); t.textContent = '';
    for (const q of (Array.isArray(h) ? h : []).slice(0, 20)) {
      const tr = document.createElement('tr');
      cells(tr, 'td', [q.SQL || q.PQL || '',
        ((q.runtimeNanoseconds || 0) / 1e6).toFixed(1) + ' ms']);
      if (q.spans) tr.title = spanText(q.spans, 0); // hover = span tree
      t.appendChild(tr);
    }
  } catch (e) {}
  try {
    // /queries (the reference's ActiveQueryStatus list) + our additive
    // "id" field feeding POST /queries/cancel?id=
    const a = await (await gf('/queries')).json();
    const t = $$('active'); t.textContent = '';
    for (const q of (a.queries || [])) {
      const tr = document.createElement('tr');
      cells(tr, 'td', [q.SQL || q.PQL || '',
        ((q.age || 0) / 1e6).toFixed(1) + ' ms']);
      const td = document.createElement('td');
      const b = document.createElement('button');
      b.textContent = 'cancel';
      b.onclick = async () => {
        await gf('/queries/cancel?id=' + q.id, { method: 'POST' });
        loadOps();
      };
      td.appendChild(b); tr.appendChild(td); t.appendChild(tr);
    }
    if (!(a.queries || []).length) {
      const tr = document.createElement('tr');
      cells(tr, 'td', ['(idle)']); t.appendChild(tr);
    }
  } catch (e) {}
}
$$('mode').onchange = () =>
  $$('pqlidx').style.display =
    $$('mode').value === 'pql' ? 'inline-block' : 'none';
$$('run').onclick = run;
try { $$('tok').value = localStorage.getItem('graft-token') || ''; } catch (_) {}
$$('tok').onchange = () => {
  try { localStorage.setItem('graft-token', $$('tok').value); } catch (_) {}
  loadSchema(); loadOps();
};
$$('q').addEventListener('keydown', e => {
  if ((e.ctrlKey || e.metaKey) && e.key === 'Enter') run();
});
loadSchema(); loadOps(); setInterval(loadOps, 10000);
</script>
</body>
</html>"""
}
