"""Built-in web chat UI — the analog of the reference's web chat app
(`mistralrs-web-chat/`), served as a single static page at ``/`` that talks
to the OpenAI-compatible API with streaming (SSE) responses.

No build step, no assets: one self-contained HTML document. The model list
comes from ``/v1/models``; requests stream through
``/v1/chat/completions`` with ``stream: true``.
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>mistralrs-tpu chat</title>
<style>
  :root { --bg:#101418; --panel:#1a2027; --text:#e6e9ed; --dim:#8b949e;
          --accent:#4f8cc9; --user:#24303d; --asst:#1d242c; }
  * { box-sizing: border-box; }
  body { margin:0; background:var(--bg); color:var(--text);
         font:15px/1.5 system-ui, sans-serif; display:flex;
         flex-direction:column; height:100vh; }
  header { padding:10px 16px; background:var(--panel); display:flex;
           gap:12px; align-items:center; }
  header h1 { font-size:15px; margin:0; font-weight:600; }
  header select, header input[type=number] {
    background:var(--bg); color:var(--text); border:1px solid #333;
    border-radius:6px; padding:4px 8px; }
  header label { color:var(--dim); font-size:12px; }
  #log { flex:1; overflow-y:auto; padding:16px; }
  .msg { max-width:46em; margin:0 auto 12px; padding:10px 14px;
         border-radius:10px; white-space:pre-wrap; }
  .user { background:var(--user); }
  .assistant { background:var(--asst); }
  .role { font-size:11px; color:var(--dim); margin:0 auto 2px;
          max-width:46em; padding:0 4px; }
  footer { padding:12px 16px; background:var(--panel); }
  form { display:flex; gap:8px; max-width:48em; margin:0 auto; }
  textarea { flex:1; resize:none; background:var(--bg); color:var(--text);
             border:1px solid #333; border-radius:8px; padding:8px 10px;
             font:inherit; height:3.2em; }
  button { background:var(--accent); color:#fff; border:0; border-radius:8px;
           padding:0 18px; font:inherit; cursor:pointer; }
  button:disabled { opacity:.5; cursor:default; }
  #stats { color:var(--dim); font-size:12px; margin-left:auto; }
</style>
</head>
<body>
<header>
  <h1>mistralrs-tpu</h1>
  <select id="model"></select>
  <label>temp <input id="temp" type="number" min="0" max="2" step="0.1"
                     value="0.7" style="width:4.5em"></label>
  <label>max <input id="maxtok" type="number" min="1" max="8192" value="512"
                    style="width:5em"></label>
  <span id="stats"></span>
</header>
<div id="log"></div>
<footer>
  <form id="f">
    <textarea id="q" placeholder="Send a message… (Enter to send, Shift+Enter for newline)"></textarea>
    <button id="send" type="submit">Send</button>
  </form>
</footer>
<script>
const log = document.getElementById('log');
const form = document.getElementById('f');
const q = document.getElementById('q');
const send = document.getElementById('send');
const stats = document.getElementById('stats');
const history = [];

fetch('/v1/models').then(r => r.json()).then(d => {
  const sel = document.getElementById('model');
  for (const m of d.data || [])
    sel.add(new Option(m.id, m.id));
});

function bubble(role, text) {
  const r = document.createElement('div');
  r.className = 'role'; r.textContent = role;
  const div = document.createElement('div');
  div.className = 'msg ' + role; div.textContent = text;
  log.append(r, div);
  log.scrollTop = log.scrollHeight;
  return div;
}

q.addEventListener('keydown', e => {
  if (e.key === 'Enter' && !e.shiftKey) { e.preventDefault(); form.requestSubmit(); }
});

form.addEventListener('submit', async e => {
  e.preventDefault();
  const text = q.value.trim();
  if (!text) return;
  q.value = ''; send.disabled = true;
  bubble('user', text);
  history.push({role: 'user', content: text});
  const out = bubble('assistant', '');
  const t0 = performance.now();
  let ntok = 0, acc = '';
  try {
    const resp = await fetch('/v1/chat/completions', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({
        model: document.getElementById('model').value || 'default',
        messages: history,
        temperature: parseFloat(document.getElementById('temp').value),
        max_tokens: parseInt(document.getElementById('maxtok').value),
        stream: true,
      }),
    });
    if (!resp.ok) { out.textContent = 'error: ' + await resp.text(); return; }
    const reader = resp.body.getReader();
    const dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let idx;
      while ((idx = buf.indexOf('\\n\\n')) >= 0) {
        const chunk = buf.slice(0, idx); buf = buf.slice(idx + 2);
        for (const line of chunk.split('\\n')) {
          if (!line.startsWith('data:')) continue;
          const data = line.slice(5).trim();
          if (data === '[DONE]') continue;
          const delta = JSON.parse(data).choices?.[0]?.delta?.content;
          if (delta) {
            acc += delta; ntok++;
            out.textContent = acc;
            log.scrollTop = log.scrollHeight;
          }
        }
      }
      const dt = (performance.now() - t0) / 1000;
      stats.textContent = ntok + ' chunks · ' + (ntok / dt).toFixed(1) + '/s';
    }
    history.push({role: 'assistant', content: acc});
  } catch (err) {
    out.textContent = 'error: ' + err;
  } finally {
    send.disabled = false; q.focus();
  }
});
</script>
</body>
</html>
"""
